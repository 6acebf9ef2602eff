package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the trigram gate: feeding the events corpus
  * (within the watermark horizon, event-time-ordered trigger splits)
  * emits exactly q285's consecutive-triple multiset, and a user quiet
  * past the horizon is EVICTED — the chain breaks, so no triple spans
  * the gap and the first two post-gap events emit nothing.
  */
class TrigramStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  test("streamed trigram multiset == batch q285 triples over the corpus") {
    implicit val sq = spark.sqlContext
    val ev = graft.Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(unix_timestamp(col("ts")), col("event_id"))
    val expected = ev
      .withColumn("t2", lag("event_type", 1).over(w))
      .withColumn("t1", lag("event_type", 2).over(w))
      .filter(col("t1").isNotNull)
      .groupBy("t1", "t2", "event_type").count()
      .as[(String, String, String, Long)].collect()
      .map { case (a, b, c, n) => (a, b, c) -> n }.toMap

    val feed = ev.collect().map(r => EventStreams.TransEv(
        r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val ms = MemoryStream[EventStreams.TransEv]
    val q = EventStreams.trigramGate(ms.toDF(), watermark = "3650 days")
      .writeStream.format("memory").queryName("tri")
      .outputMode("append").start()
    try {
      val (first, rest) = feed.splitAt(feed.length / 3)
      val (second, third) = rest.splitAt(rest.length / 2)
      Seq(first, second, third).foreach { s =>
        ms.addData(s.toSeq); q.processAllAvailable()
      }
      val streamed = spark.table("tri")
        .groupBy("t1", "t2", "t3").count()
        .as[(String, String, String, Long)].collect()
        .map { case (a, b, c, n) => (a, b, c) -> n }.toMap
      assert(expected.values.sum > 0, "corpus must produce trigrams")
      assert(streamed == expected,
        s"streamed=${streamed.toSeq.sorted.take(5)} expected=${expected.toSeq.sorted.take(5)}")
    } finally q.stop()
  }

  test("a user evicted at the watermark starts a fresh chain — no triple spans the gap") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventStreams.TransEv]
    val q = EventStreams.trigramGate(ms.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("trievict")
      .outputMode("append").start()
    try {
      // three events -> one triple; then a 10-day gap (plus a second
      // user whose fresh events advance the watermark past user 1's
      // timeout); post-gap events must NOT pair with pre-gap state
      ms.addData(Seq(
        EventStreams.TransEv(1, t("2024-01-01 10:00:00"), "view", 1),
        EventStreams.TransEv(1, t("2024-01-01 10:00:10"), "click", 2),
        EventStreams.TransEv(1, t("2024-01-01 10:00:20"), "purchase", 3)))
      q.processAllAvailable()
      ms.addData(Seq(EventStreams.TransEv(2, t("2024-01-11 10:00:00"), "view", 4)))
      q.processAllAvailable()
      ms.addData(Seq(EventStreams.TransEv(2, t("2024-01-11 10:00:05"), "view", 5)))
      q.processAllAvailable() // user 1 times out here
      ms.addData(Seq(
        EventStreams.TransEv(1, t("2024-01-11 12:00:00"), "error", 6),
        EventStreams.TransEv(1, t("2024-01-11 12:00:10"), "signup", 7)))
      q.processAllAvailable()
      val got = spark.table("trievict")
        .as[EventStreams.Trigram].collect().map(g => (g.user_id, g.t1, g.t2, g.t3)).toSet
      assert(got == Set((1L, "view", "click", "purchase")),
        s"expected only the pre-gap triple, got $got")
    } finally q.stop()
  }

  test("pre-1970 event times survive a state restore (no es1=-1 'absent' conflation)") {
    // driven through the factored fold, not a live stream: the initial
    // watermark is 0ms, so a real stream filters negative-epoch events
    // as late before the gate sees them — the sentinel bug was latent.
    // Batch 1 retains (older=view@-1000s, pending=click); the old
    // encoding stored older's epoch second (-1000 here, and -1 for an
    // event in (-2000,-1000]ms) and read ANY negative es1 back via the
    // has-older check `es1 >= 0` as "absent", dropping the spanning
    // triple on restore.
    def ev(sec: Long, tpe: String, id: Long) =
      EventStreams.TransEv(1, new Timestamp(sec * 1000L), tpe, id)
    val (out1, st1) = EventStreams.foldTrigrams(1L, None,
      Seq(ev(-1000, "view", 1), ev(-990, "click", 2)))
    assert(out1.isEmpty && st1.exists(_.has1),
      s"batch 1 must retain BOTH events: $st1")
    val (out2, _) = EventStreams.foldTrigrams(1L, st1,
      Seq(ev(-980, "purchase", 3)))
    assert(out2.map(g => (g.t1, g.t2, g.t3)) == Seq(("view", "click", "purchase")),
      s"triple spanning the restore was dropped: $out2")
  }
}
