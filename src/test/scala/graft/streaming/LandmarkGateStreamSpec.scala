package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.multimodal.Media
import graft.operators.MultimodalQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the streaming audio-landmark gate to the batch machinery it
  * claims to mirror: (1) the Scala byte kernel produces the SAME
  * landmark set per item as the engine's SQL-side chain (the two
  * implementations cannot drift on ASCII content), and (2) streaming
  * the odd audio items against an index of the even ones reproduces a
  * batch recount of matched landmarks exactly, across multiple
  * triggers.
  */
class LandmarkGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("byte kernel == SQL landmark chain per item on the real corpus") {
    val sqlSets = MultimodalQueries.audioLandmarkRows(spark, d)
      .groupBy("media_id").agg(collect_list("lm").as("lms"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val docs = graft.Tables.documents(spark, d)
      .filter((col("doc_id") % 3).cast("int") === 1)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      val kernel = Media.audioLandmarks(text.getBytes("UTF-8"),
        MultimodalQueries.AudioW, MultimodalQueries.AudioHop,
        MultimodalQueries.AudioGap).toSet
      assert(kernel == sqlSets.getOrElse(id, Set.empty[Long]),
        s"landmark sets diverge for media $id")
    }
  }

  test("streamed gate verdicts == batch recount (odd items vs even-item index)") {
    val all = MultimodalQueries.audioLandmarkRows(spark, d).localCheckpoint(false)
    val idx = all.filter(col("media_id") % 2 === 0).select("lm").distinct()
      .localCheckpoint(false)
    // batch expectation: per odd item, own landmark count + matched count
    val expected = all.filter(col("media_id") % 2 === 1)
      .join(idx.withColumn("known", lit(1)), Seq("lm"), "left")
      .groupBy("media_id")
      .agg(count(lit(1)).as("n"), count("known").as("m"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val docs = graft.Tables.documents(spark, d)
      .filter((col("doc_id") % 3).cast("int") === 1 && col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[MediaStreams.MediaMsg]
    val q = MediaStreams.landmarkGate(ms.toDF(), idx)
      .writeStream.format("memory").queryName("lmgate").outputMode("append").start()
    try {
      val ts = Timestamp.valueOf("2024-01-01 10:00:00")
      val (a, b) = docs.splitAt(docs.length / 2)
      // crafted clean items the word-salad corpus can't provide (its
      // shared vocabulary makes every real item flag): a short signal
      // (no landmarks) and a high-byte signal whose landmarks exist
      // nowhere in the ASCII index
      val short = MediaStreams.MediaMsg(-1L, ts, Array[Byte](1, 2, 3))
      val alien = MediaStreams.MediaMsg(-2L, ts,
        Array.tabulate(64)(i => (200 + i % 50).toByte))
      ms.addData(a.map { case (id, t) =>
        MediaStreams.MediaMsg(id, ts, t.getBytes("UTF-8")) }.toSeq :+ short :+ alien)
      q.processAllAvailable()
      ms.addData(b.map { case (id, t) =>
        MediaStreams.MediaMsg(id, ts, t.getBytes("UTF-8")) }.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("lmgate")
        .select("media_id", "n_landmarks", "n_matched", "flagged")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
        .toMap
      assert(streamed(-1L) == ((0L, 0L, false)), s"short signal: ${streamed(-1L)}")
      val alienN = Media.audioLandmarks(alien.content,
        MultimodalQueries.AudioW, MultimodalQueries.AudioHop,
        MultimodalQueries.AudioGap).length.toLong
      assert(alienN >= MultimodalQueries.AudioMinShared,
        "alien fixture must carry enough landmarks to COULD-flag")
      assert(streamed(-2L) == ((alienN, 0L, false)),
        s"alien signal must match nothing: ${streamed(-2L)}")
      assert(streamed.keySet - (-1L) - (-2L) == expected.keySet)
      expected.foreach { case (id, (n, m)) =>
        val (sn, sm, fl) = streamed(id)
        assert((sn, sm) == ((n, m)), s"media $id: stream ($sn,$sm) != batch ($n,$m)")
        assert(fl == (m >= MultimodalQueries.AudioMinShared))
      }
      assert(streamed.values.exists(_._3) && streamed.values.exists(!_._3),
        "fixture exercises both flagged and clean items")
    } finally q.stop()
  }
}
