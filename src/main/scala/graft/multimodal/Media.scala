package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` content plus
  * typed metadata, processed with batch-shaped per-partition operators.
  *
  * The Spark-side plumbing — schema, typed Datasets, partition-batched
  * mapPartitions, explode for frame sampling — is real and tested; the
  * codec itself is a clearly-marked deterministic stub
  * ([[StubMediaCodec]]) because no image/audio libraries exist in this
  * environment. Swapping in a real codec is a one-class change.
  *
  * Scale notes: content bytes never shuffle in these operators — decode/
  * feature-extraction is scan-stage mapPartitions, so cost is linear in
  * input bytes and parallelism is the file-split count. Frame sampling
  * multiplies rows (explode) BEFORE any shuffle, so downstream aggs see
  * (media_id, frame) keys; at 100 TB the media table would be bucketed
  * by media_id so frame-level joins stay co-located.
  */
final case class MediaMeta(
    format: String, width: Int, height: Int,
    sampleRate: Int, durationMs: Long, nFrames: Int)

final case class MediaRow(
    media_id: Long, modality: String, content: Array[Byte], meta: MediaMeta)

final case class MediaFeature(
    media_id: Long, modality: String, n_bytes: Int, feature: Array[Float])

final case class FrameRow(
    media_id: Long, frame_index: Int, frame: Array[Byte])

/** Codec boundary: decode + featurize one batch of media rows. Batch
  * granularity is the contract — real codecs amortize model/context
  * setup across a batch, exactly like a vectorized UDF.
  */
trait MediaCodec extends Serializable {
  def featurize(batch: Seq[MediaRow], dim: Int): Seq[MediaFeature]
  def decodeFrames(row: MediaRow, everyN: Int): Seq[FrameRow]
  /** Resize visual media to (w, h); non-visual modalities pass through
    * unchanged. Batch granularity like [[featurize]]. */
  def resizeBatch(batch: Seq[MediaRow], w: Int, h: Int): Seq[MediaRow]
}

/** STUB — deterministic fake standing in for a real image/audio/video
  * codec (none installed here). Features are byte-stripe LENGTHS (the
  * content split into `dim` spans, q73's frame math applied per
  * stripe); frames are byte-range slices. Deterministic byte math in
  * content length only — which is what lets q72 carry a full DuckDB
  * oracle (the round-12 verdict's no_oracle shrink): an engine-internal
  * PRNG feature (the pre-round-13 stub) was the one thing SQL could
  * not replay. Stripe lengths are ≤ content length ≪ 2²⁴, so the
  * float slots hold them exactly and integer norms recompute exactly.
  */
object StubMediaCodec extends MediaCodec {
  override def featurize(batch: Seq[MediaRow], dim: Int): Seq[MediaFeature] =
    batch.map { r =>
      val bytes = if (r.content == null) Array.empty[Byte] else r.content
      val len = bytes.length
      val span = math.max(len / dim, 1)
      val feature = Array.tabulate(dim) { i =>
        val from = math.min(i * span, len)
        val until = math.min(from + span, len)
        (until - from).toFloat
      }
      MediaFeature(r.media_id, r.modality, len, feature)
    }

  override def decodeFrames(row: MediaRow, everyN: Int): Seq[FrameRow] = {
    val n = math.max(row.meta.nFrames, 1)
    val span = math.max(row.content.length / n, 1)
    (0 until n by everyN).map { i =>
      val from = math.min(i * span, row.content.length)
      val until = math.min(from + span, row.content.length)
      FrameRow(row.media_id, i, row.content.slice(from, until))
    }
  }

  /** Stub resize: byte count scales with the pixel-area ratio
    * (min(len, max(1, floor(len * tw*th / (w*h)))) — truncation stands in
    * for re-encoding), meta gets the target dims. Audio passes through.
    * The byte math is reproduced in q74's SQL oracle, like q73's frames.
    */
  override def resizeBatch(batch: Seq[MediaRow], w: Int, h: Int): Seq[MediaRow] =
    batch.map { r =>
      // only VISUAL media resize; audio — and any future non-visual
      // modality — passes through untouched, per the trait contract
      if (r.modality != "image" && r.modality != "video") r
      else {
        val area = r.meta.width.toLong * r.meta.height
        val newLen = math.min(r.content.length.toLong,
          math.max(1L, math.floor(
            r.content.length.toDouble * (w.toLong * h) / area).toLong)).toInt
        r.copy(content = r.content.take(newLen),
          meta = r.meta.copy(width = w, height = h))
      }
    }
}

object Media {

  /** Deterministic media table derived from `documents` (no binary
    * fixtures ship with the testdata): content = utf8 bytes of text,
    * modality cycles by id, meta synthesized from length. This is the
    * demo source; a real deployment reads parquet with an actual binary
    * column — same schema, same operators.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("content"),
      struct(
        lit("stub").as("format"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (col("n_chars") * 10).cast("long").as("durationMs"),
        (col("n_chars") % 16 + 1).cast("int").as("nFrames")).as("meta"))

  /** Feature extraction: batch-shaped mapPartitions through the codec.
    * Batches of `batchSize` amortize codec setup (the vectorized-UDF
    * shape); partition boundaries are preserved — no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow], codec: MediaCodec,
      dim: Int = 16, batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => codec.featurize(batch, dim))
    }
  }

  /** Frame sampling: one row per kept frame (video only; other
    * modalities pass through as frame 0).
    */
  def sampleFrames(media: Dataset[MediaRow], codec: MediaCodec,
      everyN: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap {
      case r if r.modality == "video" => codec.decodeFrames(r, everyN)
      case r => Seq(FrameRow(r.media_id, 0, r.content))
    }
  }

  /** Resize: batch-shaped mapPartitions through the codec, same contract
    * as [[extractFeatures]] — content bytes stay in the scan stage.
    */
  def resize(media: Dataset[MediaRow], codec: MediaCodec,
      w: Int, h: Int, batchSize: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => codec.resizeBatch(batch, w, h))
    }
  }

  /** Perceptual difference-hash over raw media bytes (the pHash family's
    * dHash, on the byte stream instead of decoded pixels — codec-free,
    * so it is DETERMINISTIC and oracle-able, unlike the stub features):
    * the content is coarsened to 64 equal cells of `len/64` bytes each
    * (trailing remainder ignored), and bit i (0 ≤ i < 63) is set when
    * cell i's unsigned byte sum exceeds cell i+1's — a gradient
    * signature that survives small local edits, re-encodings that
    * preserve byte-level structure, and padding changes. Content under
    * 64 bytes degrades to per-byte gradients. 63 bits, not 64, so the
    * fingerprint stays non-negative in an int64 on every engine.
    * Bytes are read UNSIGNED (& 0xFF); over this ASCII corpus byte ==
    * char code, which is what lets the DuckDB oracle replay the hash
    * from `unicode()` codes (q177).
    */
  def dhash63(content: Array[Byte]): Long = {
    val n = content.length
    var fp = 0L
    if (n >= 64) {
      val m = n / 64
      val cells = new Array[Long](64)
      var i = 0
      while (i < 64) {
        var s = 0L
        var j = i * m
        val e = j + m
        while (j < e) { s += (content(j) & 0xFF); j += 1 }
        cells(i) = s
        i += 1
      }
      i = 0
      while (i < 63) {
        if (cells(i) > cells(i + 1)) fp |= (1L << i)
        i += 1
      }
    } else {
      var i = 0
      while (i + 1 < n && i < 63) {
        if ((content(i) & 0xFF) > (content(i + 1) & 0xFF)) fp |= (1L << i)
        i += 1
      }
    }
    fp
  }

  /** Distinct constellation landmark codes of a byte signal — the
    * Scala kernel of q229's math for the streaming ingest gate: frame
    * the unsigned byte values (width `w`, hop `hop`), take each
    * frame's peak (max), hash anchor peaks against the peak `gap`
    * frames later (p·1000003 + p'). Byte values equal the SQL chain's
    * `unicode(c)` codepoints on ASCII content (this corpus; the spec
    * pins per-item set agreement against the engine's own SQL-side
    * chain). Short signals yield an empty set, matching the SQL
    * guards. */
  def audioLandmarks(content: Array[Byte], w: Int, hop: Int, gap: Int): Array[Long] = {
    val n = content.length
    if (n < w) return Array.empty
    val nf = (n - w) / hop + 1
    val peaks = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var m = 0L
      var j = f * hop
      val e = j + w
      while (j < e) { val v = (content(j) & 0xFF).toLong; if (v > m) m = v; j += 1 }
      peaks(f) = m
      f += 1
    }
    if (nf <= gap) return Array.empty
    val out = new scala.collection.mutable.LinkedHashSet[Long]
    f = 0
    while (f < nf - gap) { out += peaks(f) * 1000003L + peaks(f + gap); f += 1 }
    out.toArray
  }
}
