package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the Markov-transition gate: feeding the events
  * corpus (within the watermark horizon) emits exactly q264's
  * consecutive-pair multiset regardless of the trigger split, and a
  * user who goes quiet past the horizon is EVICTED — the next event
  * starts a fresh chain instead of pairing across the gap.
  */
class TransitionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  test("streamed transition multiset == batch q264 pairs over the corpus") {
    implicit val sq = spark.sqlContext
    val ev = graft.Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(unix_timestamp(col("ts")), col("event_id"))
    val expected = ev
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type").count()
      .as[(String, String, Long)].collect()
      .map { case (p, n, c) => (p, n) -> c }.toMap

    // huge horizon: the corpus' quiet gaps must NOT evict mid-feed here
    // (the eviction path gets its own crafted test below)
    val feed = ev.collect().map(r => EventStreams.TransEv(
        r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val ms = MemoryStream[EventStreams.TransEv]
    val q = EventStreams.transitionGate(ms.toDF(), watermark = "3650 days")
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    try {
      val (first, second) = feed.splitAt(feed.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(second.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("trans")
        .groupBy("prev_type", "next_type").count()
        .as[(String, String, Long)].collect()
        .map { case (p, n, c) => (p, n) -> c }.toMap
      assert(streamed == expected,
        s"streamed=${streamed.toSeq.sorted.take(5)} " +
          s"expected=${expected.toSeq.sorted.take(5)}")
      assert(expected.values.sum > 0, "corpus must produce transitions")
    } finally q.stop()
  }

  test("eviction: a user quiet past the horizon starts a fresh chain") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventStreams.TransEv]
    val q = EventStreams.transitionGate(ms.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("transevict")
      .outputMode("append").start()
    try {
      // user 1's chain head; user 99 is the watermark mover
      ms.addData(Seq(EventStreams.TransEv(1, t("2024-01-01 09:00:00"), "view", 1)))
      q.processAllAvailable()
      // push the watermark past user 1's timeout (09:00 + 1h)
      ms.addData(Seq(EventStreams.TransEv(99, t("2024-01-01 13:00:00"), "view", 2)))
      q.processAllAvailable()
      // a batch WITHOUT user-1 data, watermark now 12:00 > 10:00: the
      // timeout fires and user 1's state dies
      ms.addData(Seq(EventStreams.TransEv(99, t("2024-01-01 13:01:00"), "click", 3)))
      q.processAllAvailable()
      // fresh chain: no transition across the eviction gap ...
      ms.addData(Seq(EventStreams.TransEv(1, t("2024-01-01 13:30:00"), "click", 4)))
      q.processAllAvailable()
      val afterGap = spark.table("transevict")
        .filter(col("user_id") === 1).count()
      assert(afterGap == 0,
        s"no transition may span the eviction gap, got $afterGap")
      // ... but the fresh chain pairs normally from its new head
      ms.addData(Seq(EventStreams.TransEv(1, t("2024-01-01 13:40:00"), "purchase", 5)))
      q.processAllAvailable()
      val pairs = spark.table("transevict")
        .filter(col("user_id") === 1)
        .select("prev_type", "next_type").as[(String, String)].collect()
      assert(pairs.toSeq == Seq(("click", "purchase")),
        s"fresh chain must emit exactly click->purchase, got ${pairs.toSeq}")
      // user 99's same-horizon chain was never evicted
      val u99 = spark.table("transevict")
        .filter(col("user_id") === 99)
        .select("prev_type", "next_type").as[(String, String)].collect()
      assert(u99.toSeq == Seq(("view", "click")))
    } finally q.stop()
  }
}
