package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

/** Closes the optimizer-stats loop: q253 derives broadcast-vs-shuffle
  * decisions from exact integer stats (rows × estimated width vs the
  * 10 MiB default threshold); this spec asserts that for every
  * candidate the audit marks `decisive` (≥2× away from the threshold),
  * the physical plan Spark ACTUALLY picks for the corresponding join
  * agrees with the audit's decision. Runs at sf0.1, where the lineitem
  * self-join build is decisively over threshold (est ~49 MB) and Spark
  * indeed plans it sort-merge, while all four dim builds broadcast.
  */
class JoinStrategyAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.1"

  private def hasBhj(p: SparkPlan): Boolean =
    p.collectFirst { case _: BroadcastHashJoinExec => () }.isDefined

  // the actual joins each audit candidate models: build side projected
  // to exactly the columns q253 sized
  private def joins: Map[String, DataFrame] = {
    val li = Tables.lineitem(spark, d)
    Map(
      "orders_build" -> li.select("l_orderkey").join(
        Tables.orders(spark, d).select("o_orderkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey")),
      "part_build" -> li.select("l_partkey").join(
        Tables.part(spark, d).select("p_partkey", "p_name"),
        col("l_partkey") === col("p_partkey")),
      "supplier_build" -> li.select("l_suppkey").join(
        Tables.supplier(spark, d).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey")),
      "customer_build" -> Tables.orders(spark, d).select("o_custkey").join(
        Tables.customer(spark, d).select("c_custkey", "c_nationkey", "c_name"),
        col("o_custkey") === col("c_custkey")),
      // both sides full-width: a one-column probe side would be pruned
      // below threshold and broadcast ITSELF — the audit models the
      // build side, so the probe must not be the cheaper alternative
      "lineitem_build" -> li.toDF(li.columns.map("p_" + _): _*).join(
        li, col("p_l_orderkey") === col("l_orderkey")))
  }

  private lazy val audit = SparkEntry.queries("q253_join_strategy_audit")(spark, d)
    .collect().map(r => r.getString(0) ->
      (r.getAs[String]("decision"), r.getAs[Boolean]("decisive"))).toMap

  test("every decisive stats-derived decision matches the physical plan") {
    val decisives = audit.filter(_._2._2)
    assert(decisives.nonEmpty, "no decisive candidates at sf0.1")
    decisives.foreach { case (name, (decision, _)) =>
      val actualBroadcast = hasBhj(joins(name).queryExecution.sparkPlan)
      assert(actualBroadcast == (decision == "broadcast"),
        s"$name: audit says $decision, plan says " +
          s"${if (actualBroadcast) "broadcast" else "shuffle"}")
    }
  }

  test("sf0.1 exercises both decisions (dims broadcast, self-join shuffles)") {
    assert(audit("orders_build")._1 == "broadcast")
    assert(audit("lineitem_build")._1 == "shuffle")
    assert(audit("lineitem_build")._2, "lineitem build should be decisive at sf0.1")
  }
}
