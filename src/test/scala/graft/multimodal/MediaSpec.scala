package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDs = {
    val docs = Seq(
      (0L, "an image document with some text", "en", 31L),
      (1L, "an audio document", "en", 17L),
      (2L, "a video document with longer text body here", "en", 43L),
      (5L, "another video one", "en", 17L))
      .toDF("doc_id", "text", "lang", "n_chars")
    Media.fromDocuments(docs).as[MediaRow]
  }

  test("fromDocuments yields binary content + typed meta struct") {
    val df = mediaDs.toDF()
    assert(df.schema("content").dataType.typeName == "binary")
    val meta = df.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq ==
      Seq("format", "width", "height", "sampleRate", "durationMs", "nFrames"))
    val mods = df.select("media_id", "modality").as[(Long, String)].collect().toMap
    assert(mods == Map(0L -> "image", 1L -> "audio", 2L -> "video", 5L -> "video"))
  }

  test("extractFeatures is deterministic, dimension-correct, and partition-preserving") {
    val ds = mediaDs.repartition(3)
    val a = Media.extractFeatures(ds, StubMediaCodec, dim = 8)
    assert(a.rdd.getNumPartitions == 3) // mapPartitions adds no shuffle
    val run1 = a.collect().map(f => f.media_id -> f.feature.toSeq).toMap
    val run2 = Media.extractFeatures(ds, StubMediaCodec, dim = 8)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(run1 == run2)
    assert(run1.values.forall(_.length == 8))
    assert(run1(0L) != run1(1L)) // different content -> different features
  }

  test("featurize sees batches, not single rows") {
    val rows = (1L to 100L).map(i =>
      MediaRow(i, "image", s"content-$i".getBytes("UTF-8"), MediaMeta("stub", 1, 1, 0, 0L, 1)))
    var batchSizes = List.empty[Int]
    val spyCodec = new MediaCodec {
      override def featurize(batch: Seq[MediaRow], dim: Int): Seq[MediaFeature] = {
        batchSizes ::= batch.size // driver-side: run on a local 1-partition ds below
        StubMediaCodec.featurize(batch, dim)
      }
      override def decodeFrames(row: MediaRow, everyN: Int): Seq[FrameRow] =
        StubMediaCodec.decodeFrames(row, everyN)
      override def resizeBatch(batch: Seq[MediaRow], w: Int, h: Int): Seq[MediaRow] =
        StubMediaCodec.resizeBatch(batch, w, h)
    }
    // exercise the batching contract directly (executor-side state isn't
    // visible from the driver, so test the iterator shape locally)
    val out = rows.iterator.grouped(64).flatMap(b => spyCodec.featurize(b, 4)).toSeq
    assert(out.size == 100)
    assert(batchSizes.sorted == List(36, 64)) // 100 rows -> batches of 64 + 36
  }

  test("sampleFrames explodes video by stride and passes other modalities through") {
    val out = Media.sampleFrames(mediaDs, StubMediaCodec, everyN = 4).collect()
    val byId = out.groupBy(_.media_id)
    assert(byId(0L).length == 1 && byId(0L).head.frame_index == 0) // image passthrough
    assert(byId(1L).length == 1) // audio passthrough
    // doc 2: n_chars=43 -> nFrames = 43%16+1 = 12 -> frames 0,4,8 kept
    assert(byId(2L).map(_.frame_index).sorted.toSeq == Seq(0, 4, 8))
    // frames cover distinct byte ranges
    assert(byId(2L).map(_.frame.toSeq).distinct.length == 3)
  }

  test("media table round-trips binary + struct through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    mediaDs.toDF().write.mode("overwrite").parquet(s"$dir/media")
    val back = spark.read.parquet(s"$dir/media")
    assert(back.count() == 4)
    val row = back.filter(col("media_id") === 2L)
      .select(col("meta.nFrames"), length(col("content"))).collect().head
    assert(row.getInt(0) == 12)
    assert(row.getInt(1) == 43)
  }

  test("resize scales visual content by pixel-area ratio and passes audio through") {
    val out = Media.resize(mediaDs, StubMediaCodec, w = 32, h = 24)
      .collect().map(r => r.media_id -> r).toMap
    val orig = mediaDs.collect().map(r => r.media_id -> r).toMap
    // audio: untouched, meta included
    assert(out(1L).content.sameElements(orig(1L).content))
    assert(out(1L).meta == orig(1L).meta)
    // visual: meta rewritten to target dims, bytes = min(len, max(1, floor(len*768/area)))
    Seq(0L, 2L, 5L).foreach { id =>
      val o = orig(id); val r = out(id)
      assert(r.meta.width == 32 && r.meta.height == 24)
      val area = o.meta.width.toLong * o.meta.height
      val want = math.min(o.content.length.toLong,
        math.max(1L, math.floor(o.content.length.toDouble * 768 / area).toLong)).toInt
      assert(r.content.length == want, s"media $id: ${r.content.length} != $want")
      assert(o.content.take(want).sameElements(r.content))
    }
  }

  test("dhash63: cell path, short-content path, unsigned bytes, invariances") {
    // n >= 64: 64 cells of m bytes; bit i = cell i > cell i+1
    val ascending = Array.tabulate[Byte](128)(i => i.toByte) // every cell < next
    assert(Media.dhash63(ascending) == 0L)
    val descending = Array.tabulate[Byte](128)(i => (127 - i).toByte)
    assert(Media.dhash63(descending) == (1L << 63) - 1) // all 63 bits set
    // trailing remainder bytes (len not divisible by 64) are ignored
    val padded = ascending ++ Array.fill[Byte](7)(0)
    assert(Media.dhash63(padded) == Media.dhash63(ascending))
    // n < 64: per-byte gradients
    assert(Media.dhash63(Array[Byte](5, 3, 4)) == 1L) // 5>3 sets bit 0; 3<4 clears bit 1
    assert(Media.dhash63(Array[Byte](9)) == 0L)
    assert(Media.dhash63(Array.emptyByteArray) == 0L)
    // bytes are unsigned: 0x80 (-128 signed) must read as 128 > 'a'(97)
    assert(Media.dhash63(Array[Byte](0x80.toByte, 'a'.toByte)) == 1L)
    // fingerprint is non-negative (63 bits) — the int64-portability claim
    assert(Media.dhash63(descending) >= 0L)
    // locality: one flipped byte in one cell changes at most 2 bits
    val tweaked = ascending.clone(); tweaked(70) = 127
    val h = java.lang.Long.bitCount(Media.dhash63(ascending) ^ Media.dhash63(tweaked))
    assert(h <= 2, s"one-byte edit moved $h bits")
  }
}
