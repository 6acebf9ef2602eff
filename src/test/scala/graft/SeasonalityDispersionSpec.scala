package graft

import java.sql.Timestamp

/** q374/q375 on crafted daily profiles. Seasonality: a pure weekly
  * pattern (each day-of-week repeats its count exactly across two
  * weeks) has zero within-group variance, so SS_between = SS_total and
  * strength reads EXACTLY 10⁶ ppm — the integer divisions cancel
  * because every group mean is integral; a constant series has
  * SS_total = 0 → NULL (nothing to decompose). Dispersion: constant
  * days → D = 0 → 'under'; a two-day (1, 19) split → D =
  * (2·362 − 400)·10⁶ / (2·20) = 8.1 → 'over'; and the pure-weekly
  * pattern's D = SS_tot/S = 342857142.../ ... lands 'over' too (weekly
  * structure IS overdispersion vs Poisson — the reason q374 exists
  * next to it).
  */
class SeasonalityDispersionSpec extends SparkSpec {
  import spark.implicits._

  test("weekly pattern: strength exactly 1e6; flat: NULL; dispersion verdicts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seas-").toString
    try {
      def day(typ: String, dd: Int, k: Int): Seq[(Long, Timestamp, Long, String, Double, String)] =
        (0 until k).map(i => (typ.hashCode.toLong * 100000 + dd * 1000 + i,
          Timestamp.valueOf(f"2024-03-$dd%02d 10:${i % 60}%02d:00"),
          i.toLong, typ, 1.0, "{}"))
      // 14 consecutive days: dow pattern [10,20,10,20,10,20,10] twice
      val pat = Seq(10, 20, 10, 20, 10, 20, 10)
      val rows =
        (1 to 14).flatMap(dd => day("season", dd, pat((dd - 1) % 7))) ++
        (1 to 14).flatMap(dd => day("flat", dd, 5)) ++
        day("spiky", 1, 1) ++ day("spiky", 2, 19)
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val s374 = SparkEntry.queries("q374_seasonality_strength")(spark, dir)
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
      assert(s374("season") == 1000000L, s"season: ${s374("season")}")
      assert(s374("flat") == -1L, "flat series must read NULL strength")

      val s375 = SparkEntry.queries("q375_dispersion_index")(spark, dir)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(4), r.getString(5)))).toMap
      assert(s375("flat") == ((0L, "under")), s"flat: ${s375("flat")}")
      assert(s375("spiky") == ((8100000L, "over")), s"spiky: ${s375("spiky")}")
      // weekly structure is overdispersion vs Poisson: eight 10-days +
      // six 20-days → S = 200, Σx² = 3200, D·10⁶ = (14·3200 − 200²)·10⁶
      // / (14·200) = 1714285 — the query's exact integer division
      val dSeason = (BigInt(14) * 3200 - BigInt(200) * 200) * 1000000 /
        (BigInt(14) * 200)
      assert(s375("season")._1 == dSeason.toLong, s"season D: ${s375("season")}")
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
      finally walk.close()
    }
  }
}
