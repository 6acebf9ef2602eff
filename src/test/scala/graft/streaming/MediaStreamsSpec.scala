package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class MediaStreamsSpec extends SparkSpec {
  import spark.implicits._
  import MediaStreams._

  private def t(s: String) = Timestamp.valueOf(s)

  // ≥64 bytes so the cell path (not the short-content path) is exercised
  private val base: Array[Byte] =
    ("the quick brown fox jumps over the lazy dog and then runs far away " +
      "into the quiet hills tonight while nothing else moves").getBytes("UTF-8")
  // one byte flipped inside one cell → Hamming ≤ 2 (MediaSpec's locality)
  private val nearDup: Array[Byte] = { val b = base.clone(); b(70) = 'X'.toByte; b }
  private val unrelated: Array[Byte] =
    ("Completely DIFFERENT bytes: spark shuffles, exchanges, partitions! " +
      "Codegen catalyst tungsten planning execution memory 0123456789 woo").getBytes("UTF-8")

  test("a later near-dup is flagged against the earlier owner with its true hamming") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[MediaMsg]
    val q = MediaStreams.phashNearDups(ms.toDF())
      .writeStream.format("memory").queryName("mp1").outputMode("append").start()
    try {
      ms.addData(MediaMsg(1, t("2024-01-01 10:00:00"), base))
      q.processAllAvailable()
      ms.addData(MediaMsg(2, t("2024-01-01 10:05:00"), nearDup),
        MediaMsg(3, t("2024-01-01 10:05:00"), unrelated))
      q.processAllAvailable()
      val out = spark.table("mp1").as[PhashDup].collect()
      assert(out.nonEmpty, "near-dup produced no candidates")
      assert(out.forall(c => c.media_id == 2 && c.dup_of == 1),
        s"unexpected candidates: ${out.mkString(", ")}")
      val expected = java.lang.Long.bitCount(
        graft.multimodal.Media.dhash63(base) ^ graft.multimodal.Media.dhash63(nearDup))
      assert(out.forall(_.hamming == expected))
    } finally q.stop()
  }

  test("bucket state evicts past the horizon: a replayed item re-claims, not flags") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[MediaMsg]
    val q = MediaStreams.phashNearDups(ms.toDF(),
        watermark = "1 minute", horizonSeconds = 60L)
      .writeStream.format("memory").queryName("mp2").outputMode("append").start()
    try {
      ms.addData(MediaMsg(1, t("2024-01-01 10:00:00"), base))
      q.processAllAvailable()
      ms.addData(MediaMsg(100, t("2024-01-01 11:00:00"), unrelated))
      q.processAllAvailable()
      ms.addData(MediaMsg(101, t("2024-01-01 11:00:30"), unrelated))
      q.processAllAvailable() // timeouts fire, owner evicted
      ms.addData(MediaMsg(2, t("2024-01-01 11:01:00"), base))
      q.processAllAvailable()
      val dupsOf1 = spark.table("mp2").as[PhashDup].collect().filter(_.dup_of == 1)
      assert(dupsOf1.isEmpty,
        s"flagged against evicted owner: ${dupsOf1.mkString(", ")}")
    } finally q.stop()
  }

  test("streamed flags agree with q177 over the sf0.001 corpus (two-sided, id level)") {
    val d = "/root/testdata/sf0.001"
    val media = graft.multimodal.Media
      .fromDocuments(graft.Tables.documents(spark, d))
      .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .collect().sortBy(_._1)
    val batch = graft.SparkEntry.queries("q177_media_phash_neardup")(spark, d)
      .select(col("media_id"), col("n_near_dups"), col("best_hamming"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) Long.MaxValue else r.getLong(2)))).toMap

    implicit val sq = spark.sqlContext
    val ms = MemoryStream[MediaMsg]
    val q = MediaStreams.phashNearDups(ms.toDF())
      .writeStream.format("memory").queryName("mp3").outputMode("append").start()
    try {
      ms.addData(media.map { case (id, c) =>
        MediaMsg(id, t("2024-01-01 10:00:00"), c) }.toSeq)
      q.processAllAvailable()
      val flags = spark.table("mp3").as[PhashDup].collect()
      assert(flags.nonEmpty, "corpus fixture produced no streamed near-dups")
      // soundness: a streamed flag implies a batch near-dup relation on
      // BOTH ends, at a distance no better than the batch optimum, with
      // admit-first ordering (same-ts feed → owner has the smaller id)
      flags.foreach { f =>
        assert(f.dup_of < f.media_id, s"admit-first violated: $f")
        val (nx, bx) = batch(f.media_id)
        val (no, _) = batch(f.dup_of)
        assert(nx > 0 && no > 0, s"streamed flag with no batch partner: $f")
        assert(f.hamming >= bx, s"streamed hamming beats batch best: $f vs $bx")
      }
      // completeness at the id level: any item with an IDENTICAL
      // fingerprint at a smaller id must be flagged — with the whole
      // corpus in one trigger, such an item's every block is already
      // owned by (or chained to) an earlier claimant at hamming 0
      val flagged = flags.map(_.media_id).toSet
      val fps = media.map { case (id, c) =>
        id -> graft.multimodal.Media.dhash63(c) }
      val firstOfFp = fps.groupBy(_._2).map { case (fp, xs) => fp -> xs.map(_._1).min }
      val shouldFlag = fps.collect {
        case (id, fp) if firstOfFp(fp) < id => id
      }.toSet
      assert(shouldFlag.subsetOf(flagged),
        s"batch near-dups missed by the stream: ${(shouldFlag -- flagged).toSeq.sorted.take(5)}")
    } finally q.stop()
  }
}
