package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the k-anonymity suppression gate: feeding the
  * events corpus emits exactly the rows whose (event_type, hour) QI
  * group reaches K in total — q247's release rule — each exactly once,
  * regardless of how the feed is split across triggers (the K-th
  * arrival may land a trigger after the first K-1 were withheld).
  * Crafted feeds pin the open-then-flow-through path, the exactly-K
  * boundary, and the cross-trigger buffer release.
  */
class KAnonStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)
  // K=2: the sf0.001 corpus tops out at 3-row QI groups (747/110/11
  // groups of size 1/2/3), so K=2 exercises both admission and
  // suppression; q247 itself audits at K=5 on the bigger sf
  private val K = 2

  test("streamed admissions == batch groups-with->=K rule over the corpus") {
    implicit val sq = spark.sqlContext
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    // batch rule: admit every row of a QI group with >= K rows
    val withQi = ev.withColumn("qi_hour",
      expr("unix_timestamp(ts) div 3600"))
    val full = withQi.groupBy("event_type", "qi_hour")
      .agg(count(lit(1)).as("n")).filter(col("n") >= K)
    val expected = withQi
      .join(full.select("event_type", "qi_hour"), Seq("event_type", "qi_hour"))
      .select("event_id").as[Long].collect().toSet

    val feed = ev.collect().map(r => EventStreams.AnonEv(
        r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val ms = MemoryStream[EventStreams.AnonEv]
    val q = EventStreams.kAnonGate(ms.toDF(), k = K)
      .writeStream.format("memory").queryName("kanon")
      .outputMode("append").start()
    try {
      val (first, second) = feed.splitAt(feed.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(second.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("kanon")
        .select("event_id").as[Long].collect()
      assert(streamed.length == streamed.distinct.length,
        "an event was admitted more than once")
      assert(streamed.toSet == expected,
        s"admitted=${streamed.length} expected=${expected.size}; " +
          s"missing=${(expected -- streamed.toSet).take(5)} " +
          s"extra=${(streamed.toSet -- expected).take(5)}")
      assert(expected.nonEmpty && expected.size < feed.length,
        "corpus must exercise both admission and suppression")
    } finally q.stop()
  }

  test("crafted edges: buffer releases across triggers at the K-th arrival") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventStreams.AnonEv]
    val q = EventStreams.kAnonGate(ms.toDF(), k = 3)
      .writeStream.format("memory").queryName("kanonedge")
      .outputMode("append").start()
    try {
      // two withheld arrivals in trigger 1 (below k=3)
      ms.addData(Seq(
        EventStreams.AnonEv(1, 10, t("2024-01-01 09:00:01"), "view"),
        EventStreams.AnonEv(2, 11, t("2024-01-01 09:10:00"), "view"),
        EventStreams.AnonEv(3, 12, t("2024-01-01 09:20:00"), "click")))
      q.processAllAvailable()
      assert(spark.table("kanonedge").count() == 0,
        "nothing may ship before the group fills")
      // the third view opens the gate (releases 1,2,4); a fourth flows
      // straight through; the lone click group stays withheld
      ms.addData(Seq(
        EventStreams.AnonEv(4, 13, t("2024-01-01 09:30:00"), "view"),
        EventStreams.AnonEv(5, 14, t("2024-01-01 09:40:00"), "view")))
      q.processAllAvailable()
      val got = spark.table("kanonedge")
        .select("event_id").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L, 4L, 5L),
        s"expected views 1,2,4,5 admitted and click 3 withheld, got $got")
    } finally q.stop()
  }

  test("never-filled QI group is evicted at the watermark (state bounded by open groups)") {
    // the state-bound proof: a withheld buffer holds at most K-1 rows
    // per OPEN group, and "open" is bounded by the watermark — a group
    // that never reaches K is removed when event time passes its
    // timeout, so state is proportional to live QI groups, never to
    // stream history. Pins the hasTimedOut -> state.remove() path.
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventStreams.AnonEv]
    val q = EventStreams.kAnonGate(ms.toDF(), k = 3, watermark = "1 hour")
      .writeStream.format("memory").queryName("kanonevict")
      .outputMode("append").start()
    try {
      // a lone click: buffered (1 row of state), never fills k=3
      ms.addData(Seq(EventStreams.AnonEv(1, 10, t("2024-01-01 09:00:00"), "click")))
      q.processAllAvailable()
      assert(spark.table("kanonevict").count() == 0)
      // next-day views fill their own group AND push the watermark a
      // day past the click group's 10:00 timeout
      ms.addData(Seq(
        EventStreams.AnonEv(2, 11, t("2024-01-02 09:00:00"), "view"),
        EventStreams.AnonEv(3, 12, t("2024-01-02 09:10:00"), "view"),
        EventStreams.AnonEv(4, 13, t("2024-01-02 09:20:00"), "view")))
      q.processAllAvailable()
      // one more trigger so the timeout batch (fired off the advanced
      // watermark) has definitely run before the state assertions
      ms.addData(Seq(EventStreams.AnonEv(5, 14, t("2024-01-02 09:30:00"), "view")))
      q.processAllAvailable()
      val got = spark.table("kanonevict")
        .select("event_id").as[Long].collect().sorted
      assert(got.toSeq == Seq(2L, 3L, 4L, 5L),
        s"views admitted, evicted click never emitted; got $got")
      val stateOps = q.recentProgress.toSeq.flatMap(_.stateOperators.headOption)
      assert(stateOps.map(_.numRowsRemoved).sum >= 1,
        "the click group's state row must have been REMOVED at the watermark")
      assert(stateOps.last.numRowsTotal == 1,
        s"only the open view group may hold state, got ${stateOps.last.numRowsTotal}")
    } finally q.stop()
  }
}
