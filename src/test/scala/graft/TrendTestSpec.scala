package graft

import java.sql.Timestamp

/** q252's Mann-Kendall verdicts on crafted daily profiles (the shipped
  * events fixture is volume-uniform, so the driver's hash check pins the
  * S arithmetic but every verdict stays 'none'): a strictly rising
  * 8-day ramp must read `increasing` (S = max = n(n−1)/2), a strictly
  * falling ramp `decreasing`, a sawtooth `none`, and an outlier day
  * inside an otherwise-rising week must NOT flip the verdict — the
  * robustness least-squares slopes don't have and the reason the
  * statistic is sign-based.
  */
class TrendTestSpec extends SparkSpec {
  import spark.implicits._

  test("rising ramp / falling ramp / sawtooth / outlier robustness") {
    val dir = java.nio.file.Files.createTempDirectory("graft-trend-").toString
    try {
      def day(typ: String, dd: Int, k: Int): Seq[(Long, Timestamp, Long, String, Double, String)] =
        (0 until k).map(i => (typ.hashCode.toLong * 10000 + dd * 100 + i,
          Timestamp.valueOf(f"2024-03-$dd%02d 10:${i % 60}%02d:00"),
          i.toLong, typ, 1.0, "{}"))
      val rows =
        (1 to 8).flatMap(dd => day("up", dd, dd)) ++          // 1,2,...,8
        (1 to 8).flatMap(dd => day("down", dd, 9 - dd)) ++    // 8,7,...,1
        (1 to 8).flatMap(dd => day("saw", dd, if (dd % 2 == 1) 1 else 5)) ++
        // rising except one collapsed outlier day (day 4: 1 event) —
        // sign-based S = 21 - 2 + 4 = 23, 4S = 92 > n(n-1) = 56 → still
        // increasing; the collapsed day costs 2 inversions + a tie, not
        // the verdict
        (1 to 8).flatMap(dd => day("upout", dd, if (dd == 4) 1 else dd))
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val out = SparkEntry.queries("q252_trend_test")(spark, dir)
        .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getString(4))))
        .toMap
      assert(out("up") == ((28L, "increasing")), s"up: ${out("up")}")
      assert(out("down") == ((-28L, "decreasing")), s"down: ${out("down")}")
      assert(out("saw")._2 == "none", s"saw: ${out("saw")}")
      assert(out("upout")._2 == "increasing", s"upout: ${out("upout")}")
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
      finally walk.close()
    }
  }
}
