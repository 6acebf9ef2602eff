package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Closes the skew edge of the optimizer-audit loop (the q253 pattern
  * one level down): q280 PREDICTS, in exact integers, whether AQE's
  * OptimizeSkewedJoin should fire on each q146-profiled join candidate
  * (would_mark_skew = hottest key rows > total/32); this spec EXECUTES
  * both real sort-merge joins at sf0.1 under AQE, with the byte
  * thresholds derived from the SAME even-split row target, and asserts
  * the physical plan's skew marking agrees in both directions —
  * events-by-type (5 keys, each ~6× the even split) must come out
  * `SortMergeJoin(skew=true)`, lineitem-by-suppkey (~1k keys, each far
  * under it) must not.
  *
  * The row→byte bridge: both fact sides carry the same fixed-width
  * incompressible payload (two md5 hexes, 64 chars — lz4 finds no
  * matches in hex noise, so shuffle sizes track raw width), estimated
  * at ~80 B/row with key + serialization overhead; threshold =
  * t_rows × 80 B. The negative leg does not hang on that estimate:
  * uniform keys make every partition ≈ the median, and AQE marks skew
  * only past max(threshold, factor × median), so a uniform join can
  * never qualify at factor 2 regardless of the estimate's error.
  */
class SkewRemediationAgreementSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.1"
  private val EstRowBytes = 80L

  private lazy val audit =
    SparkEntry.queries("q280_aqe_skew_audit")(spark, d)
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("t_rows"), r.getAs[Boolean]("would_mark_skew")))
      .toMap

  private def finalPlanString(df: DataFrame): String = {
    assert(df.queryExecution.toRdd.count() > 0)
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }).toString
  }

  private def withSkewConfs[T](tRows: Long)(body: => T): T = {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        (tRows * EstRowBytes).toString,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        (tRows * EstRowBytes / 4).toString,
      // q280's t_rows models the engine's 32-way even split — the
      // executed shuffle must deal the same hand (test session is 4)
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def payload(c: org.apache.spark.sql.Column) =
    concat(md5(c.cast("string")), md5(concat(c.cast("string"), lit("x"))))

  test("q280 predicts skew for events-by-type and none for lineitem-by-suppkey at sf0.1") {
    assert(audit("events_by_type")._2, "5 keys over a 32-way split must skew")
    assert(!audit("lineitem_by_suppkey")._2, "~1k uniform keys must not")
  }

  test("AQE marks the events-by-type sort-merge join skewed, agreeing with q280") {
    val (tRows, predicted) = audit("events_by_type")
    // AQE splits a skewed reduce partition at MAPPER granularity; the
    // sf0.1 events parquet is one small file = ONE map task, which is
    // unsplittable by construction (a silent no-op — found the hard
    // way). A 100-TB fact always has thousands of mappers; give the
    // toy one 16 so the mechanism under test can physically act.
    val fact = Tables.events(spark, d)
      .repartition(16, col("event_id"))
      .select(col("event_type"), payload(col("event_id")).as("pl"))
    // dim must be exchange -> sort -> SMJ directly: a distinct() would
    // leave its final HashAggregate between the join and the shuffle
    // stage, and OptimizeSkewedJoin's Sort(ShuffleStage) pattern then
    // never matches (found the hard way — the rule silently no-ops)
    import spark.implicits._
    val dim = Tables.events(spark, d).select("event_type").distinct()
      .as[String].collect().toSeq.toDF("event_type")
      .withColumn("v", lit(1))
    val plan = withSkewConfs(tRows) {
      finalPlanString(fact.join(dim, "event_type"))
    }
    assert(plan.contains("SortMergeJoin"), s"expected SMJ; plan:\n$plan")
    assert(plan.contains("skew=true") == predicted,
      s"q280 says would_mark_skew=$predicted, plan disagrees:\n$plan")
  }

  test("AQE leaves the lineitem-by-suppkey sort-merge join unsplit, agreeing with q280") {
    val (tRows, predicted) = audit("lineitem_by_suppkey")
    val fact = Tables.lineitem(spark, d)
      .select(col("l_suppkey"), payload(col("l_orderkey")).as("pl"))
    val dim = Tables.supplier(spark, d).select("s_suppkey", "s_name")
    val plan = withSkewConfs(tRows) {
      finalPlanString(fact.join(dim, col("l_suppkey") === col("s_suppkey")))
    }
    assert(plan.contains("SortMergeJoin"), s"expected SMJ; plan:\n$plan")
    assert(plan.contains("skew=true") == predicted,
      s"q280 says would_mark_skew=$predicted, plan disagrees:\n$plan")
  }
}
