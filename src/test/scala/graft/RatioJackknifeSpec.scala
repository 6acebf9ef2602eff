package graft

import java.sql.Timestamp

/** q373's delete-1-day jackknife on a hand-computable fixture: 3 days
  * with (n, Σv_micro) = (2, 2·10⁶), (1, 4·10⁶), (1, 1·10⁶) → full
  * ratio 1750000 micro; replicates 2500000 / 1000000 / 2000000 (each a
  * pure subtraction from the one rollup); their truncated mean
  * 1833333, and the spread/SE/CI columns must equal the recurrence
  * recomputed in BigInt here — pinning both the subtractive replicate
  * algebra and the identical-double-tree SE path.
  */
class RatioJackknifeSpec extends SparkSpec {
  import spark.implicits._

  test("3-day fixture: replicates, spread, and CI match the hand recurrence") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jk-").toString
    try {
      val rows = Seq(
        (1L, "2024-03-01 10:00:00", 1.0), (2L, "2024-03-01 11:00:00", 1.0),
        (3L, "2024-03-02 10:00:00", 4.0),
        (4L, "2024-03-03 10:00:00", 1.0)
      ).map { case (id, ts, v) =>
        (id, Timestamp.valueOf(ts), id, "r", v, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val r = SparkEntry.queries("q373_ratio_jackknife")(spark, dir)
        .collect().head
      assert(r.getString(0) == "r" && r.getLong(1) == 3L && r.getLong(2) == 4L)
      assert(r.getLong(3) == 1750000L, s"ratio: ${r.getLong(3)}")

      // hand recurrence
      val reps = Seq(2500000L, 1000000L, 2000000L)
      val rbar = reps.sum / 3
      assert(rbar == 1833333L)
      val ss = reps.map(x => BigInt(x - rbar) * BigInt(x - rbar)).sum
      assert(r.getString(4) == ss.toString, s"jk_ss: ${r.getString(4)}")
      val se = java.math.BigDecimal.valueOf(
        math.sqrt(2.0 / 3.0 * (ss.toDouble / 3.0)))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
      assert(r.getLong(5) == se, s"se: ${r.getLong(5)} vs $se")
      val half = java.math.BigDecimal.valueOf(1.96 * se.toDouble)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
      assert(r.getLong(6) == 1750000L - half && r.getLong(7) == 1750000L + half)
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
      finally walk.close()
    }
  }
}
