package graft

/** q367's Good–Turing table on a hand-computable corpus: tokens
  * a×3 b×2 c×1 d×1 → N = 7, N₁ = 2, N₂ = 1, N₃ = 1. Pins the adjusted
  * counts r* = (r+1)·N_{r+1}/N_r in micro units, the observed/smoothed
  * mass ppm columns, and the unseen-mass row P₀ = N₁/N — including the
  * edge semantics: r with N_r = 0 carries NULL r-star and gt columns
  * (nothing to adjust), r = 3 carries r* = 0 (N₄ = 0: GT says "worth
  * nothing
  * beyond raw" — the signal practical smoothers cut over to raw counts
  * on).
  */
class GoodTuringSpec extends SparkSpec {
  import spark.implicits._

  test("counts-of-counts, r*, and mass columns on a×3 b×2 c×1 d×1") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gt-").toString
    try {
      Seq((1L, "a a a b b c d", "en", "s", 13L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val out = SparkEntry.queries("q367_good_turing")(spark, dir)
        .collect().map { r =>
          r.getLong(0) -> ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) -1L else r.getLong(5)))
        }.toMap

      assert(out.size == 9, s"expected rows r=0..8, got ${out.keys.toSeq.sorted}")
      // r -> (n_r, n_next, r_star_micro, obs_mass_ppm, gt_mass_ppm)
      assert(out(0L) == ((0L, 2L, -1L, 0L, 285714L)), s"r=0: ${out(0L)}")
      assert(out(1L) == ((2L, 1L, 1000000L, 285714L, 285714L)), s"r=1: ${out(1L)}")
      assert(out(2L) == ((1L, 1L, 3000000L, 285714L, 428571L)), s"r=2: ${out(2L)}")
      assert(out(3L) == ((1L, 0L, 0L, 428571L, 0L)), s"r=3: ${out(3L)}")
      (4L to 8L).foreach { r =>
        assert(out(r) == ((0L, 0L, -1L, 0L, -1L)), s"r=$r: ${out(r)}")
      }
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
      finally walk.close()
    }
  }
}
