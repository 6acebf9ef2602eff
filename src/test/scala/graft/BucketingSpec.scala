package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables runs with no Exchange (shuffle-free)") {
    val d = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = spark.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 4, wh)
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 4, wh)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      // correctness unchanged vs the unbucketed join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Bucketing.drop(spark, "b_lineitem"); Bucketing.drop(spark, "b_orders")
    }
  }

  test("bucketed group-by on the bucket key needs no Exchange") {
    val d = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket2").toString
    val o = spark.read.parquet(s"$d/orders.parquet").select("o_custkey", "o_totalprice")
    Bucketing.writeBucketed(o, "b_orders_cust", "o_custkey", 4, wh)
    try {
      val agg = spark.table("b_orders_cust").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("Exchange hashpartitioning") &&
        !plan.contains("Arguments: hashpartitioning"),
        s"expected shuffle-free bucketed agg:\n$plan")
      assert(agg.count() == o.select("o_custkey").distinct().count())
    } finally Bucketing.drop(spark, "b_orders_cust")
  }
}
