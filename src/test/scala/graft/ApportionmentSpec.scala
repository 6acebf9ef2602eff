package graft

/** q214's leftover path on an uneven fixture (the shipped corpus has 20
  * equal sources, so every run there has leftover 0): with source sizes
  * 2/3/5 the √n weights don't divide the budget and the largest
  * remainders must absorb the difference — Σalloc still hits the budget
  * EXACTLY, each source within one doc of its real quota.
  */
class ApportionmentSpec extends SparkSpec {
  import spark.implicits._

  test("largest-remainder allocation conserves the budget on uneven sources") {
    val dir = java.nio.file.Files.createTempDirectory("graft-apportion-").toString
    try {
      val docs = Seq("a" -> 2, "b" -> 3, "c" -> 5).flatMap { case (src, k) =>
        (1 to k).map(i => (s"$src$i".hashCode.toLong, s"doc $i of $src", "en", src, 10L))
      }
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val rows = SparkEntry.queries("q214_budget_apportionment")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(6)))
      assert(rows.length == 3)
      val totalW = rows.map(_._2).sum
      assert(rows.map(_._4).sum == 100000L, s"budget not conserved: $rows")
      // leftover actually exercised: at least one base got topped up
      assert(rows.exists(r => r._4 == r._3 + 1), s"leftover path never fired: $rows")
      // each allocation within one doc of its exact real-valued quota
      rows.foreach { case (src, w, _, alloc) =>
        val quota = w.toDouble * 100000 / totalW
        assert(math.abs(alloc - quota) < 1.0, f"$src: alloc $alloc vs quota $quota%.2f")
      }
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
