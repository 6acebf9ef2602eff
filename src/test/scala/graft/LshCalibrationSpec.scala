package graft

import org.apache.spark.sql.functions._

/** q191's bookkeeping invariants on the real sf0.001 corpus: the
  * calibration rows must tile the stored scored-pair set exactly, the
  * cumulative columns must be true suffix sums of the per-threshold
  * rows, and the precision column must be the exact truncating integer
  * division it claims to be.
  */
class LshCalibrationSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("calibration rows tile the scored pairs; cumulatives and precision are exact") {
    val rows = SparkEntry.queries("q191_lsh_calibration")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(-_._1)
    assert(rows.nonEmpty)
    // per-row sanity
    rows.foreach { case (m, np, nt, _, _, _) =>
      assert(nt >= 0 && nt <= np, s"n_true out of range at n_match=$m")
    }
    // Σ n_pairs across thresholds == |scored_pairs| (every candidate
    // pair lands in exactly one n_match bucket)
    val total = operators.DedupQueries
      .portableScoredPairs(spark, d).count()
    assert(rows.map(_._2).sum == total,
      s"rows tile ${rows.map(_._2).sum} != scored $total")
    // cumulative columns are suffix sums in descending n_match order,
    // and precision is the truncating integer division of them
    var cp = 0L; var ct = 0L
    rows.foreach { case (m, np, nt, cumP, cumT, ppm) =>
      cp += np; ct += nt
      assert(cumP == cp && cumT == ct, s"cumulative drift at n_match=$m")
      assert(ppm == (1000000L * ct) / cp, s"precision_ppm drift at n_match=$m")
    }
    // the calibration must agree with the engine's own operating point:
    // pairs admitted at n_match >= PortMatchMin == q52's admitted set
    val admitted = operators.DedupQueries.portableScoredPairs(spark, d)
      .filter(col("n_match") >= operators.DedupQueries.PortMatchMin).count()
    assert(rows.filter(_._1 >= operators.DedupQueries.PortMatchMin).map(_._2).sum == admitted)
  }
}
