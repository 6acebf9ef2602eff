package graft

import graft.functions.MisraGriesAgg
import org.apache.spark.sql.functions._

import scala.util.Random

/** Misra–Gries sketch contracts — exercised on a SKEWED synthetic stream
  * with vocabulary ≫ k, so the eviction and merge-trim paths (which the
  * near-uniform driver testdata barely stresses) do real work here.
  */
class MisraGriesAggSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: token t_i appears ~N/(i+1) times; vocab 400. */
  private def skewedStream(seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    val toks = (0 until 400).flatMap(i => Seq.fill(2000 / (i + 1))(s"t$i"))
    rnd.shuffle(toks)
  }

  private def candidates(toks: Seq[String], k: Int, parts: Int): Set[String] = {
    val agg = MisraGriesAgg.column(k)
    toks.toDF("tok").repartition(parts)
      .agg(agg(col("tok")).as("c"))
      .collect()(0).getSeq[String](0).toSet
  }

  test("superset guarantee: every token with freq > N/(k+1) is a candidate") {
    val toks = skewedStream(seed = 1)
    val n = toks.size
    for (k <- Seq(5, 16, 50)) {
      val cands = candidates(toks, k, parts = 7)
      val truth = toks.groupBy(identity).view.mapValues(_.size)
        .filter(_._2 > n / (k + 1)).keySet.toSet
      assert(truth.subsetOf(cands),
        s"k=$k missed ${truth -- cands} (guarantee violated)")
      assert(cands.size <= k, s"k=$k sketch kept ${cands.size} > k entries")
    }
  }

  test("guarantee holds under any partitioning (merge preserves the bound)") {
    val toks = skewedStream(seed = 2)
    val n = toks.size
    val k = 12
    val truth = toks.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > n / (k + 1)).keySet.toSet
    for (parts <- Seq(1, 3, 13, 32)) {
      val cands = candidates(toks, k, parts)
      assert(truth.subsetOf(cands), s"parts=$parts missed ${truth -- cands}")
    }
  }

  test("sketch aggregation combines map-side (partial before the exchange)") {
    val agg = MisraGriesAgg.column(8)
    val plan = Seq("a", "b", "a").toDF("tok").repartition(3)
      .agg(agg(col("tok")).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_misragriesagg"),
      s"no map-side partial in:\n$plan")
  }

  test("two-pass exact heavy hitters equals brute force end-to-end") {
    val toks = skewedStream(seed = 3)
    val n = toks.size
    val k = 20 // φ = 1/21
    val df = toks.toDF("tok").repartition(9)
    val sketch = df.agg(MisraGriesAgg.column(k)(col("tok")).as("cands"),
      count(lit(1)).as("n_total")).localCheckpoint(false)
    val cand = sketch.select(explode(col("cands")).as("tok"))
    val got = df.join(broadcast(cand), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(sketch.select("n_total")))
      .filter(col("freq") * (k + 1) > col("n_total"))
      .select("tok", "freq")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.toMap
    assert(got == want)
  }
}
