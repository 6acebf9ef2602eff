package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the CUSUM drift gate: the sf0.001 events feed in
  * REVERSE event_id order across two triggers lands on q369's batch
  * answer bit-for-bit — per type the day count, ref, the FINAL day's S
  * walk value and alarm flag, and the walk's total alarm-day count —
  * because state is the same (day → count) rollup the batch query
  * reduces to (pure counts: order- and boundary-independent) and the
  * walk is re-derived with the batch's exact integer arithmetic. Also
  * pins the state bound: the per-type state is exactly one entry per
  * observed day (time-bounded, never volume-bounded).
  */
class CusumStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("reverse-order two-trigger stream converges to q369 bit-for-bit") {
    // batch truth: per type — (n_days, ref, last day's S, last alarm,
    // total alarm days)
    val batch = graft.SparkEntry.queries("q369_cusum_drift")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), BigInt(r.getString(4)), r.getLong(5)))
      .groupBy(_._1).map { case (typ, rows) =>
        val last = rows.maxBy(_._2)
        typ -> ((rows.length.toLong, last._4, last._5.toString,
          last._6, rows.map(_._6).sum))
      } // typ -> (n_days, ref_micro, last cusum, last alarm, n_alarms)

    val feed = graft.Tables.events(spark, d)
      .select(col("event_id"), col("ts"), col("event_type"))
      .collect().map(r => EventStreams.CuEv(r.getLong(0),
        r.getTimestamp(1), r.getString(2)))
      .sortBy(-_.event_id).toSeq // REVERSE order: counts must not care

    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventStreams.CuEv]
    val q = EventStreams.cusumGate(ms.toDF())
      .writeStream.format("memory").queryName("cusumg")
      .outputMode("append").start()
    try {
      val (first, second) = feed.splitAt(feed.length / 3)
      ms.addData(first)
      q.processAllAvailable()
      ms.addData(second)
      q.processAllAvailable()
      val got = spark.table("cusumg").as[EventStreams.CuVerdict].collect()
        .groupBy(_.event_type).map { case (t, vs) =>
          t -> vs.maxBy(_.n_days) }
      assert(got.keySet == batch.keySet)
      val diverged = batch.keys.filter { t =>
        val g = got(t)
        (g.n_days, g.ref_micro, g.cusum_micro, g.alarm, g.n_alarms) !=
          batch(t)
      }
      assert(diverged.isEmpty, diverged.take(3).map { t =>
        val g = got(t)
        s"$t: stream=(${g.n_days},${g.ref_micro},${g.cusum_micro}," +
          s"${g.alarm},${g.n_alarms}) batch=${batch(t)}"
      }.mkString("; "))
      // state bound: one entry per observed (type, day)
      val wantDays = graft.Tables.events(spark, d)
        .select(col("event_type"),
          expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").as("day"))
        .distinct().groupBy("event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      batch.keys.foreach(t =>
        assert(got(t).n_days == wantDays(t), s"$t state size"))
    } finally q.stop()
  }
}
