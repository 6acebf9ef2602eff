package graft

import graft.sources.ArtifactStore
import org.apache.spark.sql.functions._

/** Contract tests for the store-don't-recompute layer every dedup/ANN
  * artifact now rides on (band tables, SimHash sigs, codebooks).
  */
class ArtifactStoreSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("table(): builds exactly once per JVM, read-back equals the build") {
    var builds = 0
    def build = {
      builds += 1
      spark.read.parquet(s"$d/region.parquet").select("r_regionkey", "r_name")
    }
    val key = s"spec-${System.nanoTime}" // unique per test run
    val first = ArtifactStore.table(spark, key, "spec_plain")(build).collect().toSet
    val second = ArtifactStore.table(spark, key, "spec_plain")(build).collect().toSet
    assert(builds == 1, "second request must hit the catalog, not rebuild")
    assert(first == second)
    assert(first == spark.read.parquet(s"$d/region.parquet")
      .select("r_regionkey", "r_name").collect().toSet)
  }

  test("bucketed(): equi-join on the bucket keys reads the artifact with no Exchange") {
    val key = s"spec-${System.nanoTime}"
    val art = ArtifactStore.bucketed(spark, key, "spec_bucketed",
      Seq("l_orderkey"), 4) {
      spark.read.parquet(s"$d/lineitem.parquet").select("l_orderkey", "l_quantity")
    }
    val probe = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plan = probe.join(art.hint("merge"), Seq("l_orderkey"))
      .queryExecution.sparkPlan
    val ok = PlanAudit.hasBucketedSmj(plan)
    assert(ok, "artifact side of the join must be an exchange-free bucketed scan")
  }

  test("day-2 append into a bucketed artifact keeps the join exchange-free") {
    // the incremental contract: a new batch appends MORE files per
    // bucket (Spark routes appended rows to their buckets), the bucket
    // layout survives, and joins on the keys still need no Exchange on
    // the artifact side — the index never re-shuffles as the corpus grows
    val key = s"spec-${System.nanoTime}"
    val li = spark.read.parquet(s"$d/lineitem.parquet").select("l_orderkey", "l_quantity")
    val art = ArtifactStore.bucketed(spark, key, "spec_append",
      Seq("l_orderkey"), 4)(li.filter(col("l_orderkey") % 2 === 0))
    val before = art.count()
    ArtifactStore.append(spark, key, "spec_append", li.filter(col("l_orderkey") % 2 === 1))
    // content: old + appended batch = the full table
    assert(art.count() == li.count() && before < art.count())
    // layout: the join on the bucket key still reads the artifact with
    // no Exchange below it
    val probe = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plan = probe.join(art.hint("merge"), Seq("l_orderkey"))
      .queryExecution.sparkPlan
    val ok = PlanAudit.hasBucketedSmj(plan)
    assert(ok, "appended artifact must still join exchange-free on the bucket keys")
  }
}
