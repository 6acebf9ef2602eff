package graft

import graft.functions.{HashFunctions, MinSigAgg, PortableHashKernels}
import org.apache.spark.sql.functions._

/** q55's all-NULL-signature group edge (round-12 advice): a group whose
  * every row has NULL text never touches the portable kernel, so
  * MinSigAgg's buffer stays at its Long.MaxValue zero — which is NOT
  * the gram-less sentinel P and used to escape the sentinel->NULL
  * post-fold guard. Two such groups would then "agree" 12/12
  * (est_jaccard 1.0) on a buffer default while the DuckDB oracle's
  * min-over-NULLs yields NULL signature columns that never match.
  * The fold mapping now NULLs Long.MaxValue alongside P; this pins it.
  */
class MinSigNullGroupSpec extends SparkSpec {
  import spark.implicits._

  test("an all-null-text group folds to NULL signature, not Long.MaxValue") {
    val k = 4
    val df = Seq(
      ("nullish", Option.empty[String]),
      ("nullish", Option.empty[String]),
      ("real", Some("some actual text here")))
      .toDF("lang", "text")
    val agg = MinSigAgg.column(k)
    val folded = df
      .select(col("lang"),
        HashFunctions.portableMinhashSigNative(col("text"), 3, k).as("sig"))
      .groupBy("lang").agg(agg(col("sig")).as("sig"))
    val p = PortableHashKernels.P
    val out = folded.select(col("lang") +: (0 until k).map { i =>
      val v = element_at(col("sig"), i + 1)
      when(v === p || v === Long.MaxValue, lit(null).cast("long"))
        .otherwise(v).as(s"mh$i")
    }: _*).collect().map(r => r.getString(0) -> (1 to k).map(r.isNullAt)).toMap
    assert(out("nullish").forall(identity),
      "all-null-text group must surface NULL signature slots")
    assert(out("real").forall(!_), "real text must keep its signature")
  }
}
