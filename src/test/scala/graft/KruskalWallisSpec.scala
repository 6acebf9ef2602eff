package graft

/** q368's Kruskal–Wallis on crafted fixtures: an exact no-tie case
  * (en lengths {1,2} vs de {3,4}: ranks 1..4, R_en = 3, R_de = 7 →
  * H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 2.4 exactly, tie term 0, so the
  * corrected statistic equals the raw one), and the k = 2 identity:
  * on a two-language source the tie-corrected H must equal the square
  * of q358's Mann–Whitney z (chi-square with 1 dof IS z² — the two
  * queries compute the same test two ways, so their agreement pins
  * both rank algebras at once).
  */
class KruskalWallisSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, String, Long)]): Unit =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("exact no-tie case: H = 2.4, tie-corrected equals raw") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kw-").toString
    try {
      writeDocs(dir, Seq(
        (1L, "x", "en", "s", 1L), (2L, "x", "en", "s", 2L),
        (3L, "x", "de", "s", 3L), (4L, "x", "de", "s", 4L)))
      val r = SparkEntry.queries("q368_kruskal_wallis")(spark, dir)
        .collect().head
      assert(r.getLong(1) == 4L && r.getLong(2) == 2L)      // n_total, k
      assert(r.getString(3) == "29000000", s"rank_term_sum: ${r.getString(3)}")
      assert(r.getString(4) == "0", s"tie_term: ${r.getString(4)}")
      assert(r.getLong(5) == 2400000L, s"h_micro: ${r.getLong(5)}")
      assert(r.getLong(6) == 2400000L, s"h_tie_micro: ${r.getLong(6)}")
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
      finally walk.close()
    }
  }

  test("k = 2 with ties: tie-corrected H equals Mann-Whitney z squared") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kw2-").toString
    try {
      val en = Seq(5L, 7L, 7L, 9L, 11L)
      val de = Seq(6L, 7L, 8L, 10L)
      writeDocs(dir,
        (en.zipWithIndex.map { case (v, i) => (i + 1L, "x", "en", "s", v) } ++
          de.zipWithIndex.map { case (v, i) => (i + 10L, "x", "de", "s", v) }))
      val kw = SparkEntry.queries("q368_kruskal_wallis")(spark, dir)
        .collect().head
      val mw = SparkEntry.queries("q358_mann_whitney")(spark, dir)
        .collect().head
      val hTie = kw.getLong(6).toDouble / 1e6
      val z = mw.getLong(5).toDouble / 1e6
      assert(math.abs(hTie - z * z) < 1e-4,
        s"h_tie = $hTie vs z^2 = ${z * z} (z = $z)")
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
      finally walk.close()
    }
  }
}
