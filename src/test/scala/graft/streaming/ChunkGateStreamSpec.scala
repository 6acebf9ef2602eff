package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch/stream agreement for the stateless chunk-cost gate: every doc
  * streamed through [[DocStreams.chunkGate]] must carry exactly the
  * per-doc chunk accounting q254's batch rollup aggregates — both ride
  * the ONE shared `TextQueries.chunkCostFrame` closed form, and this
  * spec pins that the source-level rollup of the streamed verdicts
  * reproduces q254's rows bit-for-bit.
  */
class ChunkGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  final case class GateDoc(doc_id: Long, ts: Timestamp, source: String,
      text: String)

  test("streamed chunk verdicts roll up to q254's batch rows") {
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(docs.nonEmpty)

    implicit val sq = spark.sqlContext
    val ms = MemoryStream[GateDoc]
    val q = DocStreams.chunkGate(ms.toDF())
      .writeStream.format("memory").queryName("chunkgate")
      .outputMode("append").start()
    try {
      val (first, second) = docs.splitAt(docs.length / 2)
      ms.addData(first.map { case (id, src, tx) =>
        GateDoc(id, t("2024-01-01 10:00:00"), src, tx) }.toSeq)
      q.processAllAvailable()
      ms.addData(second.map { case (id, src, tx) =>
        GateDoc(id, t("2024-01-01 10:05:00"), src, tx) }.toSeq)
      q.processAllAvailable()

      val streamed = spark.table("chunkgate")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chunks").cast("long").as("n_chunks"),
          sum("n_tok").cast("long").as("n_tokens"),
          sum("dup_tok").cast("long").as("dup_tokens"),
          when(sum("n_tok") === 0, lit(null).cast("long"))
            .otherwise(expr("CAST(SUM(dup_tok) * 1000000 div SUM(n_tok) AS BIGINT)"))
            .as("overhead_ppm"),
          sum("frag").cast("long").as("frag_tail_chunks"))
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      val batch = graft.SparkEntry.queries("q254_chunk_overlap_cost")(spark, d)
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (src, row) =>
        assert(row == batch(src), s"$src: stream $row vs batch ${batch(src)}")
      }
      // stateless: no state store rows anywhere in the query
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }
}
