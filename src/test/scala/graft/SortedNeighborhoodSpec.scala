package graft

/** q370's sorted-neighborhood blocking on a prefix-clustered fixture:
  * five docs whose 16-char normalized prefixes sort as d5 < d3 < d1 <
  * d2 < d4 (d1/d2 share the prefix — the boilerplate-head case SNM
  * exists for — and tiebreak on doc_id). With W = 4 the candidate set
  * is exactly every pair within sorted-order distance 1..3 (counts
  * n−d: 4, 3, 2), the one true near-dup pair (d1,d2) lands at distance
  * 1 with 3-gram Jaccard 6/7 = 857142 ppm ≥ the 0.6 gate, and every
  * other pair reads 0 — pinning both the block-keyed pair generation
  * (no pair missed across block boundaries, none duplicated) and the
  * exact verify arithmetic.
  */
class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  test("window-4 candidates, boundary pairs, and the d1~d2 match") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snm-").toString
    try {
      val docs = Seq(
        (1L, "the quick brown fox jumps over lazy dog"),
        (2L, "the quick brown fox jumps over lazy dog today"),
        (3L, "mister maple visits green tall tree often"),
        (4L, "zulu zebra walks across dusty plain slowly"),
        (5L, "another totally unrelated body of text here"))
      docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val out = SparkEntry.queries("q370_sorted_neighborhood")(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap // dist -> (n_pairs, n_matches, mean_jacc_ppm)
      // d1~d2: grams 6 vs 7, intersection 6 -> 6*1e6 div 7 = 857142;
      // the other three distance-1 pairs read 0 -> mean 857142 div 4
      assert(out(1L) == ((4L, 1L, 214285L)), s"dist 1: ${out(1L)}")
      assert(out(2L) == ((3L, 0L, 0L)), s"dist 2: ${out(2L)}")
      assert(out(3L) == ((2L, 0L, 0L)), s"dist 3: ${out(3L)}")
      assert(out.size == 3)
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
      finally walk.close()
    }
  }
}
