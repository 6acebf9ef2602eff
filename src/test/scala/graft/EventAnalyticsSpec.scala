package graft

import org.apache.spark.sql.functions._

/** Invariants for the event-analytics additions (q132/q133) beyond the
  * DuckDB hash check: z-score well-definedness and retention bounds.
  */
class EventAnalyticsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("q132: z is NULL exactly when the trailing window is degenerate") {
    val rows = q("q132_rate_anomaly").collect()
    rows.foreach { r =>
      val k = r.getLong(3)
      if (k < 2) assert(r.isNullAt(4), s"z defined with k=$k prior days")
      if (!r.isNullAt(4))
        assert(r.isNullAt(5) == false &&
          (math.abs(r.getDouble(4)) >= 3.0) == r.getBoolean(5))
    }
    // each type's first day has an empty trailing window
    assert(rows.count(_.getLong(3) == 0L) >= 1)
  }

  test("q133: retention bounded by 1 and exact at offset 0") {
    val rows = q("q133_cohort_retention").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, active, size, ret) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(active <= size && ret <= 1.0 + 1e-9)
      // every cohort member is active in their own first week by definition
      if (off == 0L) assert(active == size)
    }
  }
}
