package graft

import java.sql.Timestamp

/** q369's closed-form CUSUM against the textbook recurrence on a step
  * shift: daily volumes 10,10,10,10,30,30,30,30 → ref = 20·10⁶ micro,
  * slack k = ref/8 = 2.5·10⁶, threshold h = ref. The S walk must read
  * 0 through the low half (drift never accumulates below ref+k), then
  * 7.5, 15, 22.5, 30 (·10⁶) through the high half — crossing h on day
  * 7, not day 5 (CUSUM pages on SUSTAINED shift, not the first high
  * day) — and the closed form S_d = prefix_d − min(0, min_{j≤d}
  * prefix_j) must equal the recurrence max(0, S_{d−1} + dev_d) day by
  * day.
  */
class CusumDriftSpec extends SparkSpec {
  import spark.implicits._

  test("step shift: S walk matches the recurrence, alarm fires day 7") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cusum-").toString
    try {
      val daily = Seq(10, 10, 10, 10, 30, 30, 30, 30)
      val rows = daily.zipWithIndex.flatMap { case (n, di) =>
        (0 until n).map(i => (di * 1000L + i,
          Timestamp.valueOf(f"2024-03-${di + 1}%02d 10:${i % 60}%02d:00"),
          i.toLong, "click", 1.0, "{}"))
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val out = SparkEntry.queries("q369_cusum_drift")(spark, dir)
        .collect().map(r => r.getLong(1) ->
          ((r.getLong(2), r.getLong(3), r.getString(4).toLong, r.getLong(5))))
        .toMap // day -> (x, ref_micro, cusum_micro, alarm)
      assert(out.size == 8)
      val days = out.keys.toSeq.sorted

      // engine-independent recurrence replay
      val ref = 20000000L
      val k = ref / 8
      var sRec = 0L
      days.zip(daily).foreach { case (day, x) =>
        sRec = math.max(0L, sRec + (x * 1000000L - ref - k))
        val (xOut, refOut, s, alarm) = out(day)
        assert(xOut == x && refOut == ref, s"day $day: x=$xOut ref=$refOut")
        assert(s == sRec, s"day $day: closed-form $s vs recurrence $sRec")
        assert(alarm == (if (s > ref) 1L else 0L), s"day $day alarm")
      }
      assert(days.map(out(_)._4) == Seq(0L, 0L, 0L, 0L, 0L, 0L, 1L, 1L),
        "alarm must fire on days 7-8 only")
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
      finally walk.close()
    }
  }
}
