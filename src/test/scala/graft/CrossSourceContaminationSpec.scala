package graft

/** q58's engine form (per-hash distinct-source counts joined back) must
  * match the oracle's NULL-STRICT self-join semantics on the edges the
  * sf corpora never exercise: a NULL-source doc whose text also appears
  * in ≥2 real sources (the oracle's `a.source <> b.source` is NULL on
  * the a-side, so it is NEVER leaked — the engine used to flag it), a
  * NULL-source partner (never makes another doc leaked), and a
  * NULL-text doc (NULL md5 matches nothing but still counts in n_docs).
  * The expectation here IS the oracle replayed driver-side over the
  * fixture, not hand-written numbers.
  */
class CrossSourceContaminationSpec extends SparkSpec {

  test("q58 matches the oracle's NULL-strict <> on NULL source/text docs") {
    import spark.implicits._
    val rows: Seq[(Long, Option[String], String, Option[String])] = Seq(
      (1L, Some("dup"), "en", Some("a")),
      (2L, Some("dup"), "en", Some("b")),
      (3L, Some("dup"), "en", None), // hash spans {a,b} but own source NULL
      (4L, Some("solo"), "en", Some("a")),
      (5L, None, "en", Some("b")), // NULL text: in n_docs, never leaked
      (6L, Some("dup"), "en", Some("a")) // same-source duplicate: not leaked by itself
    )
    val dir = java.nio.file.Files.createTempDirectory("graft-q58-").toString
    try {
      rows.map { case (id, t, l, s) => (id, t.orNull, l, s.orNull,
          t.map(_.length.toLong).getOrElse(0L)) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      // oracle semantics replayed exactly: leaked ⟺ ∃ partner with same
      // md5 and a NON-NULL different source, both sides' source non-null
      val leaked = rows.filter { case (_, t, _, s) =>
        t.isDefined && s.isDefined && rows.exists { case (_, t2, _, s2) =>
          t2 == t && s2.isDefined && s2 != s
        }
      }.map(_._1).toSet
      assert(leaked == Set(1L, 2L, 6L), "fixture sanity: docs 3/4/5 never leak")
      val expected = rows.groupBy(_._4).map { case (src, docs) =>
        (src.orNull, docs.size.toLong, docs.count(d => leaked(d._1)).toLong)
      }.toSet

      val got = SparkEntry.queries("q58_cross_source_contamination")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected)
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
