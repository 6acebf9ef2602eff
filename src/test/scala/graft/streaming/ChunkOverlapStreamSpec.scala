package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.DedupQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch/stream agreement for the incremental chunk overlap: streaming
  * the new batch through [[DocStreams.chunkOverlap]] against the SAME
  * stored chunk inventory q209 reads must reproduce q209's per-doc
  * numbers exactly — both paths cut identical content-defined
  * boundaries and fold identical chunk fingerprints.
  */
class ChunkOverlapStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  test("streamed chunk overlap == q209 batch on the sf0.001 corpus") {
    val occ = DedupQueries.cdcChunkOcc(spark, d)
    val idxFps = occ.filter(col("doc_id") % 5 =!= 0).select("chunk_fp").distinct()

    val newDocs = graft.Tables.documents(spark, d)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().sortBy(_._1)
    assert(newDocs.nonEmpty)

    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.Doc]
    val q = DocStreams.chunkOverlap(ms.toDF(), idxFps)
      .writeStream.format("memory").queryName("chov").outputMode("append").start()
    try {
      val (first, second) = newDocs.splitAt(newDocs.length / 2)
      ms.addData(first.map { case (id, tx) =>
        DocStreams.Doc(id, t("2024-01-01 10:00:00"), tx) }.toSeq)
      q.processAllAvailable()
      ms.addData(second.map { case (id, tx) =>
        DocStreams.Doc(id, t("2024-01-01 10:05:00"), tx) }.toSeq)
      q.processAllAvailable()

      val streamed = spark.table("chov").as[DocStreams.ChunkOverlap].collect()
        .map(a => a.doc_id ->
          ((a.n_chunks, a.n_tokens, a.known_chunks, a.known_tokens, a.flagged)))
        .toMap
      val batch = graft.SparkEntry.queries("q209_incremental_chunk_overlap")(spark, d)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getBoolean(5)))).toMap

      // batch omits chunk-less docs; the stream emits them as zero rows
      val zeroOnly = streamed.keySet -- batch.keySet
      assert(zeroOnly.forall(k => streamed(k) == ((0L, 0L, 0L, 0L, false))),
        s"stream-only docs must be zero rows: ${zeroOnly.take(3)}")
      assert((batch.keySet -- streamed.keySet).isEmpty,
        s"batch-only docs missing from the stream: ${(batch.keySet -- streamed.keySet).take(3)}")
      val diverged = batch.keys.filter(k => streamed(k) != batch(k)).toSeq.sorted
      assert(diverged.isEmpty,
        diverged.take(5).map(k => s"doc $k: stream=${streamed(k)} batch=${batch(k)}")
          .mkString("\n"))
      assert(streamed.values.exists(_._5) && streamed.values.exists(!_._5),
        "corpus fixture no longer has both flagged and clean docs")
    } finally q.stop()
  }

  test("NULL/empty/whitespace docs flow through as zero rows, never phantom chunks") {
    val idxFps = Seq(123L).toDF("chunk_fp")
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.Doc]
    val q = DocStreams.chunkOverlap(ms.toDF(), idxFps)
      .writeStream.format("memory").queryName("chov2").outputMode("append").start()
    try {
      ms.addData(Seq(
        DocStreams.Doc(1L, t("2024-01-01 10:00:00"), null),
        DocStreams.Doc(2L, t("2024-01-01 10:00:00"), ""),
        DocStreams.Doc(3L, t("2024-01-01 10:00:00"), "   "),
        DocStreams.Doc(4L, t("2024-01-01 10:00:00"), "one two three")))
      q.processAllAvailable()
      val out = spark.table("chov2").as[DocStreams.ChunkOverlap].collect()
        .map(a => a.doc_id -> ((a.n_chunks, a.n_tokens, a.flagged))).toMap
      assert(out(1L) == ((0L, 0L, false)) && out(2L) == ((0L, 0L, false)) &&
        out(3L) == ((0L, 0L, false)), s"degenerate docs: $out")
      assert(out(4L)._1 >= 1L && out(4L)._2 == 3L,
        s"real doc must chunk its 3 tokens: ${out(4L)}")
    } finally q.stop()
  }
}
