package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the stateful conversion-latency gate: feeding the
  * events corpus in event-time order (views before purchases within a
  * second — the gate's documented intake contract) emits exactly one
  * (user, latency) per converting user, with latencies equal to q242's
  * batch v/p definition (first purchase at or after the first view).
  * A crafted feed pins one-emission-per-user across triggers, the
  * pre-view purchase being ignored, and the same-second conversion.
  */
class ConversionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  test("streamed conversions == batch first-view/first-purchase over the corpus") {
    implicit val sq = spark.sqlContext
    val ev = graft.Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
    // expected per-user latency: q242's v/p aggregates verbatim
    val e = ev.select(col("user_id"), col("event_type"),
      unix_timestamp(col("ts")).as("es"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("es").as("v_es"))
    val p = v.join(e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("es")), Seq("user_id"))
      .filter(col("es") >= col("v_es"))
      .groupBy("user_id").agg(min("es").as("p_es"))
    val expected = v.join(p, Seq("user_id"))
      .select(col("user_id"), (col("p_es") - col("v_es")).as("gap"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val feed = ev.collect().map(r => EventStreams.FunnelEv(
        r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
      .sortBy(e => (e.ts.getTime,
        if (e.event_type == "view") 0 else 1, e.event_id))
    val ms = MemoryStream[EventStreams.FunnelEv]
    val q = EventStreams.conversionGate(ms.toDF())
      .writeStream.format("memory").queryName("convg")
      .outputMode("append").start()
    try {
      val (first, second) = feed.splitAt(feed.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(second.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("convg").as[EventStreams.Conversion].collect()
      // exactly one emission per converting user
      assert(streamed.map(_.user_id).distinct.length == streamed.length)
      val got = streamed.map(c => c.user_id -> c.gap_seconds).toMap
      assert(got.keySet == expected.keySet)
      val diverged = expected.keys.filter(k => got(k) != expected(k)).toSeq.sorted
      assert(diverged.isEmpty, diverged.take(5).map(k =>
        s"user $k: stream=${got(k)} batch=${expected(k)}").mkString("\n"))
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("crafted edges: pre-view purchase ignored, same-second conversion, one emission") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventStreams.FunnelEv]
    val q = EventStreams.conversionGate(ms.toDF())
      .writeStream.format("memory").queryName("convedge")
      .outputMode("append").start()
    try {
      ms.addData(Seq(
        EventStreams.FunnelEv(1, t("2024-01-01 09:00:00"), "purchase", 1), // pre-view
        EventStreams.FunnelEv(1, t("2024-01-01 10:00:00"), "view", 2),
        EventStreams.FunnelEv(2, t("2024-01-01 10:00:00"), "view", 3),
        EventStreams.FunnelEv(2, t("2024-01-01 10:00:00"), "purchase", 4))) // same second
      q.processAllAvailable()
      ms.addData(Seq(
        EventStreams.FunnelEv(1, t("2024-01-01 10:05:00"), "purchase", 5),
        EventStreams.FunnelEv(1, t("2024-01-01 10:09:00"), "purchase", 6))) // silent
      q.processAllAvailable()
      val out = spark.table("convedge").as[EventStreams.Conversion].collect()
        .map(c => c.user_id -> c.gap_seconds).toMap
      assert(out == Map(1L -> 300L, 2L -> 0L))
    } finally q.stop()
  }
}
