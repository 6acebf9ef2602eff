package graft

import java.sql.Timestamp

/** q372's robustness claim, demonstrated: a perfectly linear daily ramp
  * (x = 2d + 3 over 7 days) reads slope 2.0 from BOTH estimators; the
  * same ramp with day 2 collapsed to a single event still reads
  * Theil–Sen 2.0 exactly (the 15 untouched pairs out-vote the 6
  * outlier pairs — median rank 11 of 21 lands on the 2·10⁶ plateau)
  * while OLS drags to 2428571 micro (= ⌊68·10⁶/28⌋, computed from the
  * same centered moments the query's translation-invariant integer
  * formula reduces to). The gap between the two columns IS the
  * operator's signal.
  */
class TheilSenSpec extends SparkSpec {
  import spark.implicits._

  test("linear ramp: both slopes 2.0; collapsed day: TS holds, OLS drags") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts-").toString
    try {
      def day(typ: String, dd: Int, k: Int): Seq[(Long, Timestamp, Long, String, Double, String)] =
        (0 until k).map(i => (typ.hashCode.toLong * 100000 + dd * 1000 + i,
          Timestamp.valueOf(f"2024-03-$dd%02d 10:${i % 60}%02d:00"),
          i.toLong, typ, 1.0, "{}"))
      val rows =
        (1 to 7).flatMap(dd => day("lin", dd, 2 * dd + 3)) ++
        (1 to 7).flatMap(dd => day("out", dd, if (dd == 2) 1 else 2 * dd + 3))
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val out = SparkEntry.queries("q372_theil_sen")(spark, dir)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap // typ -> (n_days, n_pairs, ts_slope_micro, ols_slope_micro)
      assert(out("lin") == ((7L, 21L, 2000000L, 2000000L)),
        s"lin: ${out("lin")}")
      assert(out("out") == ((7L, 21L, 2000000L, 2428571L)),
        s"out: ${out("out")}")
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
      finally walk.close()
    }
  }
}
