package graft

/** The property q199's serpentine order exists for, measured against the
  * naive alternative: on a descending-size fixture (32..1 tokens),
  * plain rank-mod-8 dealing stacks the big docs on low shards (spread
  * 28 tokens) while boustrophedon dealing's complementary rounds land
  * every shard on EXACTLY the same total. The spec computes both from
  * the same ranks so the comparison can't drift from the query.
  */
class ShardDealingSpec extends SparkSpec {
  import spark.implicits._

  test("serpentine dealing beats rank-mod dealing on a descending-size fixture") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-").toString
    try {
      (1 to 32).map(i => (i.toLong, ("tok " * (33 - i)).trim, "en", "src", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val rows = SparkEntry.queries("q199_shard_dealing")(spark, dir)
        .collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))) // (n_tokens, rk, shard)
      assert(rows.length == 32)

      def spread(assign: ((Long, Long, Long)) => Long): Long = {
        val sums = rows.groupBy(assign).map(_._2.map(_._1).sum)
        sums.max - sums.min
      }
      val serp = spread(_._3)
      val modulo = spread { case (_, rk, _) => (rk - 1) % 8 }
      assert(serp == 0L,
        s"serpentine should balance the 32..1 fixture exactly, spread=$serp")
      assert(modulo == 28L,
        s"fixture sanity: rank-mod spread should be 28, got $modulo")
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
