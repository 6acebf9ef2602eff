package graft

import org.apache.spark.sql.functions._

/** Quantitative gates for the sketch aggregates (q25 portable HLL +
  * histogram median, q224 per-source portable HLL) — queries whose
  * VALUE correctness is about ERROR BOUNDS, not equality (the DuckDB
  * oracle proves both engines compute the same estimate; these tests
  * prove the estimate is any good). A sketch-parameter regression
  * fails the build instead of sliding through hash-matched-but-wrong.
  */
class SketchAccuracySpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // q25 (portable since round 12): (o_orderpriority, n, hll_custs,
  // approx_median_cents)
  private lazy val rows = SparkEntry.queries("q25_sketch_aggs")(spark, d)
    .collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  // exact LOWER median in cents (rank ceil(n/2)) — the order statistic
  // the histogram sketch brackets; the interpolated percentile() can sit
  // half a central GAP away, which at sf0.001's sparsity is thousands of
  // dollars and says nothing about the sketch
  private lazy val exact = Tables.orders(spark, d)
    .groupBy("o_orderpriority")
    .agg(count(lit(1)).as("cnt"),
      countDistinct(col("o_custkey")).as("nd"),
      expr("sort_array(collect_list(CAST(round(o_totalprice * 100) AS BIGINT)))" +
        "[CAST((count(1) + 1) / 2 AS INT) - 1]").as("med_cents"))
    .collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("q25 n equals the exact group count") {
    exact.foreach { case (k, (cnt, _, _)) => assert(rows(k)._1 == cnt) }
  }

  test("q25 portable HLL within estimator error bounds of exact NDV per group") {
    // m=128 raw-HLL sigma is 1.04/sqrt(128) = 9.2% relative; gate 3.8
    // sigma = 35% with an absolute floor of 8 for the linear-counting
    // regime these small sf0.001 groups live in (same convention as the
    // q224 gate below)
    exact.foreach { case (k, (_, nd, _)) =>
      val hll = rows(k)._2
      assert(math.abs(hll - nd) <= math.max(8L, (nd * 0.35).toLong),
        s"$k: hll $hll vs exact $nd")
    }
  }

  test("q25 histogram median within half a $100 bucket of the exact lower median") {
    // the lower median lies INSIDE the selected bucket by construction,
    // so the midpoint is off by <= 5000 cents — a tight structural
    // bound, not a statistical one
    exact.foreach { case (k, (_, _, medCents)) =>
      val approx = rows(k)._3
      assert(math.abs(approx - medCents) <= 5000L,
        s"$k: approx median $approx cents vs exact lower median $medCents")
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
