package graft

import java.sql.Timestamp

/** q212's bands on a crafted weekday profile (the shipped events fixture
  * is volume-uniform, so the driver's hash check pins the math but never
  * trips a flag): Mondays normally get 4 events; one Monday gets 12
  * (spike: 12 > 2·4), one gets 1 (quiet: 1·2 < 4), and the in-band
  * Mondays flag nothing. The baseline is the lower median of the SAME
  * weekday only — the quiet Thursday volume (2/day) must not dilute it.
  */
class SeasonalAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("spike and quiet fire against the same-weekday median, not the global one") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seasonal-").toString
    try {
      // Mondays in Jan 2024: 1st, 8th, 15th, 22nd, 29th; Thursdays: 4th, 11th, ...
      def day(d: String, k: Int): Seq[(Long, Timestamp, Long, String, Double, String)] =
        (0 until k).map(i => (d.hashCode.toLong * 100 + i,
          Timestamp.valueOf(s"2024-01-$d 10:0$i:00"), i.toLong, "click", 1.0, "{}"))
      val rows = day("01", 4) ++ day("08", 4) ++ day("15", 12) ++ // spike Monday
        day("22", 1) ++ day("29", 4) ++ // quiet Monday (22nd)
        day("04", 2) ++ day("11", 2) ++ day("18", 2) // Thursdays, lower volume
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val out = SparkEntry.queries("q212_seasonal_anomaly")(spark, dir)
        .collect()
        .map(r => r.getDate(1).toString ->
          ((r.getLong(2), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))).toMap
      // Monday lower median over (1, 4, 4, 4, 12) = 4
      assert(out("2024-01-15") == ((12L, 4L, true, false)), s"spike: ${out("2024-01-15")}")
      assert(out("2024-01-22") == ((1L, 4L, false, true)), s"quiet: ${out("2024-01-22")}")
      assert(out("2024-01-01") == ((4L, 4L, false, false)))
      // Thursdays judged against their own 2/day profile — all in band
      assert(out("2024-01-04") == ((2L, 2L, false, false)), s"thu: ${out("2024-01-04")}")
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
