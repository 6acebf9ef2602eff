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
      |       count(*) AS n, SUM(CAST(strlen(text) AS BIGINT)) AS total_bytes
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

  /** Frame sampling: explode video rows into frames, profile per media. */
  val q73 = QueryDef.rowsOnly("q73_frame_sample")(
    (s, d) => Media.sampleFrames(mediaDs(s, d), StubMediaCodec, everyN = 4)
      .toDF()
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames_kept"),
        sum(length(col("frame"))).as("frame_bytes")))

  val defs: Seq[QueryDef] = Seq(q71, q72, q73)
}
