package graft

import org.apache.spark.sql.functions._

/** NULL-text parity for the span family (q58's convention: the shipped
  * corpora have zero NULL texts, but NULL-text behavior is a declared
  * contract, pinned on a fixture the testdata never exercises): a
  * NULL-text doc tokenizes to the EMPTY list on both engines — q178
  * must fingerprint it as md5('') (the oracle COALESCEs DuckDB's
  * NULL-on-NULL split; the engine coalesces the token array), never as
  * a NULL fingerprint — and q175 must report it as span-free.
  */
class SpanFamilyNullSpec extends SparkSpec {

  test("q175/q178 treat a NULL-text doc as an empty token stream, not NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-span-null-").toString
    try {
      val dup = "alpha beta gamma delta epsilon zeta eta theta"
      Seq(
        (1L, dup, "en", "a", dup.length.toLong),
        (2L, dup, "en", "b", dup.length.toLong), // exact dup: q178 cleans fully
        (3L, null.asInstanceOf[String], "en", "c", 0L),
        (4L, "one two", "en", "a", 7L)) // under SpanK tokens: gram-less
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val r178 = SparkEntry.queries("q178_span_removal")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(5)))).toMap
      val md5Empty = "d41d8cd98f00b204e9800998ecf8427e"
      val md5 = (s: String) => java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      // NULL text: zero tokens, zero removed, md5 of the EMPTY string
      assert(r178(3L) == ((0L, 0L, md5Empty)), s"NULL-text doc: ${r178(3L)}")
      // the later exact dup removes everything; the canonical doc keeps all
      assert(r178(2L) == ((8L, 8L, md5Empty)))
      assert(r178(1L) == ((8L, 0L, md5(dup))))
      assert(r178(4L) == ((2L, 0L, md5("one two"))))

      val r175 = SparkEntry.queries("q175_repeated_spans")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // n_spans
      assert(r175(3L) == 0L && r175(4L) == 0L)
      assert(r175(1L) == 1L && r175(2L) == 1L) // both sides of the dup report the span
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("removal implies spans, not conversely (canonical occurrences survive)") {
    // cross-query coherence on the real corpus: q178 cuts a doc only
    // where q175 reported a span (shared gpos artifact + oracle
    // fragment, so a violation means the island/canonical logic forked)
    // — while a doc holding only CANONICAL occurrences has spans but no
    // removal, so the converse must NOT hold (both sets non-empty at
    // sf0.001: 57 span-docs, 30 removal-docs when this was pinned)
    val d = "/root/testdata/sf0.001"
    val removed = SparkEntry.queries("q178_span_removal")(spark, d)
      .filter(col("n_removed") > 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val spanned = SparkEntry.queries("q175_repeated_spans")(spark, d)
      .filter(col("n_spans") > 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(removed.nonEmpty && (spanned -- removed).nonEmpty,
      s"fixture degenerated: removed=${removed.size} spanned=${spanned.size}")
    assert(removed.subsetOf(spanned),
      s"docs cut without a reported span: ${(removed -- spanned).toSeq.sorted.take(5)}")
  }
}
