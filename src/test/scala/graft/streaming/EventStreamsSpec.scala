package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class StreamEvent(ts: Timestamp, event_type: String, value: Double)

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming tumbling agg converges to the batch answer (complete mode)") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[StreamEvent]
    val rows = Seq(
      StreamEvent(t("2024-01-01 10:05:00"), "view", 1.5),
      StreamEvent(t("2024-01-01 10:55:00"), "view", 2.5),
      StreamEvent(t("2024-01-01 11:05:00"), "click", 4.0),
      StreamEvent(t("2024-01-01 11:06:00"), "view", 0.5))
    val q = EventStreams.tumbling(ms.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    try {
      ms.addData(rows.take(2))
      ms.addData(rows.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("tumb")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val batch = EventStreams.tumbling(rows.toDF())
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch)
      assert(streamed == Set(
        (t("2024-01-01 10:00:00"), "view", 2L, 400L),
        (t("2024-01-01 11:00:00"), "click", 1L, 400L),
        (t("2024-01-01 11:00:00"), "view", 1L, 50L)))
    } finally q.stop()
  }

  test("append mode finalizes windows at the watermark and drops too-late rows") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[StreamEvent]
    val q = EventStreams.tumbling(ms.toDF(), size = "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      ms.addData(StreamEvent(t("2024-01-01 10:00:00"), "view", 1.0),
        StreamEvent(t("2024-01-01 10:30:00"), "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("late").count() == 0) // watermark 09:30 — window still open
      ms.addData(StreamEvent(t("2024-01-01 12:30:00"), "click", 1.0))
      q.processAllAvailable() // watermark 11:30 — the 10:00 window closes
      ms.addData(StreamEvent(t("2024-01-01 10:45:00"), "view", 9.0)) // behind watermark
      q.processAllAvailable()
      val out = spark.table("late")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(out == Set((t("2024-01-01 10:00:00"), "view", 2L))) // late row dropped
    } finally q.stop()
  }

  test("session_window agg matches the stateful fold and the lag+cumsum formulation on real data") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start"),
        r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events"))

    val viaSessionWindow = EventStreams.sessionWindows(events, "30 minutes")
      .collect().map(key).toSet
    val viaStateful = EventStreams.sessionizeBatch(
      events.select(col("user_id"), col("event_id"), col("ts")).as[EventStreams.Ev], 1800)
      .toDF().collect().map(key).toSet
    val viaWindowFuncs = graft.operators.EventQueries.q31
      .fn(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(key).toSet
    assert(viaSessionWindow.nonEmpty)
    assert(viaSessionWindow == viaStateful)
    assert(viaSessionWindow == viaWindowFuncs)
  }

  test("stream-stream join matches clicks to same-user views within the horizon") {
    implicit val sq = spark.sqlContext
    final case class UEv(event_id: Long, user_id: Long, ts: Timestamp)
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Long, Timestamp)]
    def df(ms: MemoryStream[(Long, Long, Timestamp)]) =
      ms.toDF().toDF("event_id", "user_id", "ts")
    val q = EventStreams.clickToRecentViews(df(clicks), df(views))
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      views.addData((100L, 1L, t("2024-01-01 10:00:00")), // in horizon
        (101L, 1L, t("2024-01-01 08:00:00")),             // too old
        (102L, 2L, t("2024-01-01 10:20:00")))             // other user
      clicks.addData((200L, 1L, t("2024-01-01 10:30:00")))
      q.processAllAvailable()
      val out = spark.table("ssj")
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(out == Set((200L, 100L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replays inside the state horizon") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val q = EventStreams.dedupWithinWatermark(
        ms.toDF().toDF("event_id", "ts"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      ms.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:01:00")))
      q.processAllAvailable()
      ms.addData((1L, t("2024-01-01 10:05:00"))) // replay of event 1 — dropped
      q.processAllAvailable()
      assert(spark.table("dd").count() == 2)
      assert(spark.table("dd").select("event_id").collect()
        .map(_.getLong(0)).toSet == Set(1L, 2L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits a session only when a newer event closes it") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventStreams.Ev]
    val q = EventStreams.sessionizeStateful(
        ms.toDS().withWatermark("ts", "2 hours"), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      ms.addData(EventStreams.Ev(1, 1, t("2024-01-01 10:00:00")),
        EventStreams.Ev(1, 2, t("2024-01-01 10:10:00")))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0) // session still open in state
      ms.addData(EventStreams.Ev(1, 3, t("2024-01-01 11:00:00"))) // > 30 min gap
      q.processAllAvailable()
      val out = spark.table("sess").as[EventStreams.Session].collect().toSet
      assert(out == Set(EventStreams.Session(1, t("2024-01-01 10:00:00"),
        t("2024-01-01 10:10:00"), 2)))
      // state survived across triggers: closing the second session works too
      ms.addData(EventStreams.Ev(1, 4, t("2024-01-01 13:00:00")))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 2)
    } finally q.stop()
  }

  test("event-time timeout flushes an idle user's final session and evicts state") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventStreams.Ev]
    val q = EventStreams.sessionizeStateful(
        ms.toDS().withWatermark("ts", "10 minutes"), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sess_to").outputMode("append").start()
    try {
      ms.addData(EventStreams.Ev(1, 1, t("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // another user's much-later event advances the watermark past
      // user 1's last + gap (10:30); the timeout fires on a later batch
      ms.addData(EventStreams.Ev(2, 2, t("2024-01-01 11:00:00")))
      q.processAllAvailable()
      ms.addData(EventStreams.Ev(2, 3, t("2024-01-01 11:05:00")))
      q.processAllAvailable()
      val out = spark.table("sess_to").as[EventStreams.Session].collect().toSet
      assert(out.contains(EventStreams.Session(1, t("2024-01-01 10:00:00"),
        t("2024-01-01 10:00:00"), 1)), s"timed-out session not flushed: $out")
    } finally q.stop()
  }

  test("late event inside the watermark extends the open session instead of rewinding it") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventStreams.Ev]
    val q = EventStreams.sessionizeStateful(
        ms.toDS().withWatermark("ts", "6 hours"), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sess_late").outputMode("append").start()
    try {
      ms.addData(EventStreams.Ev(1, 1, t("2024-01-01 10:00:00")),
        EventStreams.Ev(1, 2, t("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // late arrival (10:05 < state.last 10:10) must not rewind `last`:
      // the 10:36 event is 26 min after 10:10 — same session if last
      // stayed 10:10, a spurious split if it was rewound to 10:05
      ms.addData(EventStreams.Ev(1, 3, t("2024-01-01 10:05:00")))
      q.processAllAvailable()
      ms.addData(EventStreams.Ev(1, 4, t("2024-01-01 10:36:00")))
      q.processAllAvailable()
      assert(spark.table("sess_late").count() == 0,
        "open session was spuriously split by a late arrival")
      // a real gap closes one 4-event session spanning 10:00-10:36
      ms.addData(EventStreams.Ev(1, 5, t("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val out = spark.table("sess_late").as[EventStreams.Session].collect().toSet
      assert(out == Set(EventStreams.Session(1, t("2024-01-01 10:00:00"),
        t("2024-01-01 10:36:00"), 4)))
    } finally q.stop()
  }
}
