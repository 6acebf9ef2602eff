package graft

import org.apache.spark.sql.functions._

/** Gates for q244's portable-HLL NDV column — the ANALYZE stats query
  * whose hash-matched `ndv` is an ESTIMATE (128-bucket portable HLL),
  * so the driver's oracle equality proves replayability, not accuracy.
  * This spec pins accuracy against exact NDV per column, the estimator
  * invariants the CBO consumer relies on, and the native codepoint-hash
  * kernel against its HOF spec.
  */
class TableStatsHllSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val stats = SparkEntry.queries("q244_table_stats")(spark, d)
    .collect().map(r => r.getString(0) -> r).toMap

  private lazy val exactNdv = {
    val li = Tables.lineitem(spark, d)
    li.columns.filter(stats.contains).map(c =>
      c -> li.agg(countDistinct(col(c))).head().getLong(0)).toMap
  }

  test("HLL ndv within ~3 sigma (30%) of exact for every column") {
    // m = 128 => sigma = 1.04/sqrt(128) ~ 9.2%; gate at ~3 sigma plus an
    // absolute floor of 2 for the tiny-domain flag columns (observed
    // worst case across sf0.001-0.1 after the quadratic mix + pow2
    // frame fixes: +20.8%)
    exactNdv.foreach { case (c, nd) =>
      val est = stats(c).getAs[Long]("ndv")
      assert(math.abs(est - nd) <= math.max(2L, (nd * 0.30).toLong),
        s"$c: hll $est vs exact $nd")
    }
  }

  test("low-cardinality flag columns are exact via linear counting") {
    // NDV 2-4 leaves >= 124 empty buckets: the LC path returns the exact
    // count unless two values collide into one bucket (not on this data)
    Seq("l_returnflag", "l_linestatus").foreach { c =>
      assert(stats(c).getAs[Long]("ndv") == exactNdv(c),
        s"$c: ${stats(c).getAs[Long]("ndv")} vs ${exactNdv(c)}")
    }
  }

  test("row count, null count and numeric min/max stay exact") {
    val li = Tables.lineitem(spark, d)
    val n = li.count()
    stats.values.foreach(r => assert(r.getAs[Long]("n_rows") == n))
    stats.values.foreach(r => assert(r.getAs[Long]("n_nulls") == 0L))
    val (mno, mxo) = li.agg(min("l_orderkey"), max("l_orderkey"))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong)).head()
    assert(stats("l_orderkey").getAs[Long]("min_k") == mno)
    assert(stats("l_orderkey").getAs[Long]("max_k") == mxo)
  }

  test("native portable_cp_hash == HOF portableStringHash spec") {
    import graft.functions.{HashFunctions, TextFunctions}
    val docs = Tables.documents(spark, d).select(col("text")).limit(500)
    val diff = docs.select(
      HashFunctions.portableCpHashNative(col("text")).as("a"),
      TextFunctions.portableStringHash(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L)
  }
}
