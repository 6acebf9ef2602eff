package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the A/B monitor gate: the per-arm enrolled /
  * converted totals over the corpus equal q268's (n, c) regardless of
  * trigger split, each user emits each kind at most once within the
  * horizon, and the Scala arm replay matches the SQL md5 rule.
  */
class AbGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  test("Scala arm replay == the SQL md5 last-nibble rule over the corpus") {
    val users = graft.Tables.events(spark, d)
      .select(col("user_id"),
        when(substring(md5(col("user_id").cast("string")), 32, 1)
          .isin("0", "2", "4", "6", "8", "a", "c", "e"), "A").otherwise("B")
          .as("arm"))
      .distinct().as[(Long, String)].collect()
    users.foreach { case (u, arm) =>
      assert(EventStreams.abArm(u) == arm, s"arm mismatch for user $u")
    }
    assert(users.map(_._2).toSet == Set("A", "B"),
      "corpus must populate both arms")
  }

  test("streamed per-arm enrolled/converted == batch q268 counts") {
    implicit val sq = spark.sqlContext
    val ev = graft.Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_type"))
    val batch = ev.groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
        .as("conv"))
      .select(
        when(substring(md5(col("user_id").cast("string")), 32, 1)
          .isin("0", "2", "4", "6", "8", "a", "c", "e"), "A").otherwise("B")
          .as("arm"), col("conv"))
      .groupBy("arm").agg(count(lit(1)).as("n"), sum("conv").as("c"))
      .as[(String, Long, Long)].collect()
      .map { case (a, n, c) => a -> ((n, c)) }.toMap

    val feed = ev.collect().map(r => EventStreams.AbEv(
        r.getLong(0), r.getTimestamp(1), r.getString(2)))
      .sortBy(_.ts.getTime)
    val ms = MemoryStream[EventStreams.AbEv]
    val q = EventStreams.abGate(ms.toDF(), watermark = "3650 days")
      .writeStream.format("memory").queryName("abgate")
      .outputMode("append").start()
    try {
      val (first, second) = feed.splitAt(feed.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(second.toSeq)
      q.processAllAvailable()
      val out = spark.table("abgate")
      // at most one emission per (user, kind) within the horizon
      val dup = out.groupBy("user_id", "kind").count()
        .filter(col("count") > 1).count()
      assert(dup == 0, s"$dup duplicated (user, kind) emissions")
      val streamed = out.groupBy("arm")
        .agg(count(when(col("kind") === "enrolled", 1)).as("n"),
          count(when(col("kind") === "converted", 1)).as("c"))
        .as[(String, Long, Long)].collect()
        .map { case (a, n, c) => a -> ((n, c)) }.toMap
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("conversion lands even when purchase precedes a same-user view in one trigger") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventStreams.AbEv]
    val q = EventStreams.abGate(ms.toDF())
      .writeStream.format("memory").queryName("abgateedge")
      .outputMode("append").start()
    try {
      // purchase arrives in the same trigger as the (earlier) first
      // view: within-trigger ts sort must enroll at the VIEW's ts
      ms.addData(Seq(
        EventStreams.AbEv(7, t("2024-01-01 09:30:00"), "purchase"),
        EventStreams.AbEv(7, t("2024-01-01 09:00:00"), "view")))
      q.processAllAvailable()
      val rows = spark.table("abgateedge")
        .select("kind", "ts").as[(String, Timestamp)].collect().toMap
      assert(rows.keySet == Set("enrolled", "converted"))
      assert(rows("enrolled") == t("2024-01-01 09:00:00"),
        "enrollment must anchor at the user's earliest event in the trigger")
      assert(rows("converted") == t("2024-01-01 09:30:00"))
    } finally q.stop()
  }
}
