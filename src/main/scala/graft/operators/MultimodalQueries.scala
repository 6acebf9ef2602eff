package graft.operators

import graft.{QueryDef, Tables}
import graft.multimodal._
import org.apache.spark.sql.functions._

/** Multimodal pipeline surface (rows-only: the codec is the engine's
  * deterministic stub). Real plumbing under test: binary columns + typed
  * meta structs, partition-batched featurization, frame-sample explode.
  */
object MultimodalQueries {

  private def mediaDs(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    Media.fromDocuments(Tables.documents(s, d)).as[MediaRow]
  }

  /** Binary metadata profile with a DuckDB oracle — proves the binary
    * column + meta struct schema round-trips through parquet. */
  val q71 = QueryDef.oracle("q71_media_profile",
    """SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |            WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |       count(*) AS n, CAST(SUM(CAST(strlen(text) AS BIGINT)) AS BIGINT) AS total_bytes
      |FROM documents GROUP BY 1""".stripMargin)(
    (s, d) => Media.fromDocuments(Tables.documents(s, d))
      .groupBy("modality")
      .agg(count(lit(1)).as("n"), sum(length(col("content"))).as("total_bytes")))

  /** Batched feature extraction through the (stub) codec. */
  val q72 = QueryDef.rowsOnly("q72_media_features")(
    (s, d) => Media.extractFeatures(mediaDs(s, d), StubMediaCodec, dim = 16)
      .toDF()
      .select(col("media_id"), col("modality"), col("n_bytes"),
        size(col("feature")).as("feature_dim"),
        round(graft.functions.VectorFunctions.l2Norm(col("feature")), 4).as("feature_norm")))

  /** Frame sampling: explode video rows into frames, profile per media.
    * HASH-MATCHED: the stub codec's byte-slice math (nFrames from
    * n_chars, span = bytes/nFrames, every 4th frame) is reproduced in
    * SQL, so the oracle numerically validates the Dataset flatMap +
    * explode plumbing, not just row counts. Non-video modalities pass
    * through as one frame of the full content.
    */
  val q73 = QueryDef.oracle("q73_frame_sample",
    """SELECT doc_id AS media_id,
      |       CASE WHEN CAST(doc_id % 3 AS INTEGER) = 2
      |            THEN CAST((n + 3) // 4 AS BIGINT) ELSE 1 END AS n_frames_kept,
      |       CASE WHEN CAST(doc_id % 3 AS INTEGER) = 2
      |            THEN CAST(list_aggregate(
      |                   [least(least(i * span, len) + span, len) - least(i * span, len)
      |                    FOR i IN range(0, n, 4)], 'sum') AS BIGINT)
      |            ELSE CAST(len AS BIGINT) END AS frame_bytes
      |FROM (SELECT doc_id,
      |        CAST(n_chars % 16 + 1 AS INTEGER) AS n,
      |        CAST(strlen(text) AS INTEGER) AS len,
      |        greatest(CAST(strlen(text) AS INTEGER) // CAST(n_chars % 16 + 1 AS INTEGER), 1) AS span
      |      FROM documents)""".stripMargin)(
    (s, d) => Media.sampleFrames(mediaDs(s, d), StubMediaCodec, everyN = 4)
      .toDF()
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames_kept"),
        sum(length(col("frame"))).as("frame_bytes")))

  /** Resize to 32x24 through the (stub) codec. HASH-MATCHED like q73:
    * the stub's byte-area math (min(len, max(1, floor(len * 768 / area)))
    * for visual modalities, passthrough for audio) is reproduced in SQL,
    * so the oracle numerically validates the batched mapPartitions
    * resize plumbing — meta rewrite included — not just row counts.
    */
  val q74 = QueryDef.oracle("q74_media_resize",
    """SELECT doc_id AS media_id,
      |       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |            WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |       CASE WHEN CAST(doc_id % 3 AS INTEGER) = 1
      |            THEN CAST(n_chars % 64 + 1 AS INTEGER) ELSE 32 END AS width,
      |       CASE WHEN CAST(doc_id % 3 AS INTEGER) = 1
      |            THEN CAST(n_chars % 48 + 1 AS INTEGER) ELSE 24 END AS height,
      |       CASE WHEN CAST(doc_id % 3 AS INTEGER) = 1
      |            THEN CAST(strlen(text) AS BIGINT)
      |            ELSE least(CAST(strlen(text) AS BIGINT),
      |                   greatest(1, CAST(floor(strlen(text) * (32.0 * 24.0)
      |                     / ((n_chars % 64 + 1) * (n_chars % 48 + 1)))
      |                     AS BIGINT)))
      |       END AS resized_bytes
      |FROM documents""".stripMargin)(
    (s, d) => Media.resize(mediaDs(s, d), StubMediaCodec, w = 32, h = 24)
      .toDF()
      .select(col("media_id"), col("modality"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        length(col("content")).cast("long").as("resized_bytes")))

  val defs: Seq[QueryDef] = Seq(q71, q72, q73, q74)
}
