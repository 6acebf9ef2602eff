package graft

import graft.functions.MinHashAgg
import org.apache.spark.sql.functions._

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private val k = 16
  private val rows = Seq(
    ("g1", Seq("a b", "b c")),
    ("g1", Seq("b c", "c d")),
    ("g2", Seq("x y")),
    ("g2", Seq.empty[String]))

  private def sigOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] = {
    val agg = MinHashAgg.column(k)
    df.groupBy("g").agg(agg(col("grams")).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
  }

  test("group signature equals the signature of the union of member sets") {
    val df = rows.toDF("g", "grams")
    val grouped = sigOf(df)
    // union computed as a single row per group
    val unioned = sigOf(Seq(("g1", Seq("a b", "b c", "c d")), ("g2", Seq("x y")))
      .toDF("g", "grams"))
    assert(grouped == unioned)
  }

  test("signature is partitioning-invariant (merge correctness)") {
    val df = rows.toDF("g", "grams")
    assert(sigOf(df.repartition(1)) == sigOf(df.repartition(7)))
  }

  test("empty group yields the sentinel signature") {
    val only = sigOf(Seq(("e", Seq.empty[String])).toDF("g", "grams"))
    assert(only("e") == List.fill(k)(Long.MaxValue))
  }
}
