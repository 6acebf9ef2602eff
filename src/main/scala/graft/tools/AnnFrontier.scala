package graft.tools

import graft.{GraftSession, SparkEntry}
import graft.operators.SimilarityQueries

/** Dev tool: measure the IVF recall-vs-nprobe frontier against the
  * brute-force ground truth (the numbers in SCALE.md's frontier table).
  * Usage: runMain graft.tools.AnnFrontier [sfDir]
  */
object AnnFrontier {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = if (a.nonEmpty) a(0) else "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("q61_ann_bruteforce")(spark, d)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"ground truth: ${exact.size} (query, neighbor) pairs at $d")
    for (np <- Seq(4, 8, 12, 16, 20, 24, 28, 32)) {
      val approx = SimilarityQueries.ivfTop10(spark, d, np)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exact.count(approx.contains).toDouble / exact.size
      println(f"nprobe=$np%2d  fraction=${np / 64.0}%.3f  recall@10=$recall%.3f")
    }
    spark.stop()
  }
}
