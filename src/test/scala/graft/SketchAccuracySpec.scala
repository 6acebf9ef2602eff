package graft

import org.apache.spark.sql.functions._

/** Quantitative gates for q25's sketch aggregates — the one rows-only
  * query whose correctness is about ERROR BOUNDS, not equality. Pins the
  * approximation quality against the exact answers computed on the same
  * data, so a sketch-parameter regression (or an upstream behavior
  * change) fails the build instead of sliding through the rows-only
  * check.
  */
class SketchAccuracySpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val rows = SparkEntry.queries("q25_sketch_aggs")(spark, d)
    .collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getLong(3).toDouble, r.getLong(4))).toMap

  private lazy val exact = Tables.orders(spark, d)
    .groupBy("o_orderpriority")
    .agg(countDistinct(col("o_custkey")).as("nd"),
      expr("percentile(o_totalprice, 0.5)").as("med"))
    .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("approx_count_distinct (HLL++) within 2 sigma (10%) of exact per group") {
    // default rsd = 0.05 is the ONE-sigma relative error; gate at 2 sigma
    // (observed: 5.4% worst group at sf0.001)
    exact.foreach { case (k, (nd, _)) =>
      val approx = rows(k)._1
      assert(math.abs(approx - nd) <= math.max(2L, (nd * 0.10).toLong),
        s"$k: approx $approx vs exact $nd")
    }
  }

  test("DataSketches HLL estimate also within 5% of exact per group") {
    exact.foreach { case (k, (nd, _)) =>
      val hll = rows(k)._3
      assert(math.abs(hll - nd) <= math.max(1.0, nd * 0.05),
        s"$k: hll $hll vs exact $nd")
    }
  }

  test("percentile_approx median within 2% relative error of exact") {
    exact.foreach { case (k, (_, med)) =>
      val approx = rows(k)._2
      assert(math.abs(approx - med) <= med * 0.02,
        s"$k: approx median $approx vs exact $med")
    }
  }

  test("q224 portable HLL within estimator error bounds of the exact count per source") {
    // raw-HLL sigma with m=128 is 1.04/sqrt(128) = 9.2% relative (gate
    // 3.8 sigma = 35%); the linear-counting regime (small sources — this
    // corpus's templated vocab lives there) is far tighter, gated at
    // max(8, 15%). The regime split is the query's own 2.5m rule.
    val hll = SparkEntry.queries("q224_portable_hll")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(hll.nonEmpty)
    hll.foreach { case (src, (exactN, nEmpty, est)) =>
      val bound =
        if (nEmpty > 0 && est <= 320) math.max(8.0, exactN * 0.15)
        else exactN * 0.35
      assert(math.abs(est - exactN) <= bound,
        s"$src: HLL est $est vs exact $exactN (empty buckets: $nEmpty)")
    }
  }
}
