package graft

import org.apache.spark.sql.functions._

/** q194's stage semantics on a corpus where every drop reason is known
  * by construction: an exact duplicate (stage 1), a low-quality doc
  * (stage 3), the eval source itself and a doc sharing a 4-gram with
  * it (stage 4), and a NULL-text doc that must stay in the funnel
  * through the NULL-safe keeper join and drop at quality. Plus
  * monotonicity on the real sf0.001 corpus.
  */
class CurationFunnelSpec extends SparkSpec {
  import spark.implicits._

  test("each stage drops exactly the crafted offenders; NULL text survives to quality") {
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel-").toString
    val good = "the quick brown fox jumps over the lazy dog again and again today more words"
    val eval = "evaluation benchmark question about world capitals and rivers answer key"
    val leak = "students often ask the question about world capitals when they study geography maps"
    Seq(
      (1L, good, "en", "s1"),  // survives everything
      (2L, good, "en", "s1"),  // exact dup of 1 -> drops at stage 1
      (3L, "zz zz zz zz", "en", "s1"), // quality 0.46 -> drops at stage 3
      (4L, eval, "en", "src0"),        // eval source -> drops at stage 4
      (5L, leak, "en", "s1"),          // shares a 4-gram with eval -> stage 4
      (6L, null.asInstanceOf[String], "en", "s1")) // NULL text -> quality drop
      .map { case (id, t, l, src) => (id, t, l, src, if (t == null) 0L else t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // precondition the expectations rest on: the only near-dup pair in
    // this corpus is the exact-dup pair (1,2) — the leak doc's 2 shared
    // 3-grams with eval must not band-collide
    val pairs = operators.DedupQueries.portableScoredPairs(spark, dir)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"unexpected candidate pairs: $pairs")
    val out = SparkEntry.queries("q194_curation_funnel")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(0L) == ("raw", 6L))
    assert(out(1L) == ("exact_dedup", 5L), s"stage1: $out")
    assert(out(2L) == ("near_dedup", 5L), s"stage2: $out")
    assert(out(3L) == ("quality", 3L), s"stage3: $out")   // drops 3 and the NULL doc
    assert(out(4L) == ("decontam", 1L), s"stage4: $out")  // drops eval + leak
  }

  test("funnel is monotone non-increasing on the real corpus, stage 0 matches raw totals") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q194_curation_funnel")(spark, d)
      .orderBy("stage")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 5)
    val docs = Tables.documents(spark, d)
    assert(rows(0)._1 == docs.count())
    val rawChars = docs.agg(coalesce(sum(length(col("text"))), lit(0L)))
      .collect()(0).getLong(0)
    assert(rows(0)._3 == rawChars)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._1 <= a._1 && b._2 <= a._2 && b._3 <= a._3, s"not monotone: ${rows.toSeq}")
    }
  }
}
