package graft

import org.apache.spark.sql.functions._

/** Approximation-quality gate for the LSH-bucketed ANN path: recall@10
  * against the brute-force ground truth must stay useful. This pins the
  * trade the scale path makes, so a refactor that silently destroys
  * recall fails the build rather than the user.
  */
class AnnRecallSpec extends SparkSpec {

  test("LSH multi-probe ANN achieves >= 0.5 recall@10 vs brute force at sf0.001") {
    val d = "/root/testdata/sf0.001"
    def topk(name: String): Map[(Long, Long), Int] =
      SparkEntry.queries(name)(spark, d)
        .select(col("q_id"), col("vec_id"), col("rk"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

    val exact = topk("q61_ann_bruteforce")
    val approx = topk("q62_ann_lsh_bucketed")
    val hit = exact.keySet.count(approx.contains)
    val recall = hit.toDouble / exact.size
    info(f"recall@10 = $recall%.3f (${exact.size} ground-truth pairs)")
    assert(recall >= 0.5, f"LSH ANN recall degraded: $recall%.3f")
  }

  test("IVF nprobe=8/64 ANN achieves >= 0.4 recall@10 vs brute force at sf0.001") {
    val d = "/root/testdata/sf0.001"
    def topk(name: String): Map[(Long, Long), Int] =
      SparkEntry.queries(name)(spark, d)
        .select(col("q_id"), col("vec_id"), col("rk"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

    val exact = topk("q61_ann_bruteforce")
    val approx = topk("q64_ann_ivf")
    val hit = exact.keySet.count(approx.contains)
    val recall = hit.toDouble / exact.size
    info(f"recall@10 = $recall%.3f (${exact.size} ground-truth pairs)")
    assert(recall >= 0.4, f"IVF ANN recall degraded: $recall%.3f")
  }
}
