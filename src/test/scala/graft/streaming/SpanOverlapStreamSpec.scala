package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.DedupQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch/stream agreement for the incremental span overlap: streaming
  * today's docs through [[DocStreams.spanOverlap]] against the SAME
  * stored gram inventory q180 reads must reproduce q180's per-doc
  * numbers exactly — both paths hash identical gram strings and apply
  * the same coverage/flag math (merged intervals ≡ the per-token HOF).
  */
class SpanOverlapStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  test("streamed span overlap == q180 batch on the sf0.001 corpus") {
    val g = DedupQueries.storedGramPositions(spark, d, DedupQueries.SpanK)
    val idxGrams = g.filter(col("doc_id") % 5 =!= 0).select("gh").distinct()

    val newDocs = graft.Tables.documents(spark, d)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().sortBy(_._1)
    assert(newDocs.nonEmpty)

    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.AdmissionDoc]
    val q = DocStreams.spanOverlap(ms.toDF(), idxGrams)
      .writeStream.format("memory").queryName("spov").outputMode("append").start()
    try {
      val (first, second) = newDocs.splitAt(newDocs.length / 2)
      ms.addData(first.map { case (id, tx) =>
        DocStreams.AdmissionDoc(id, t("2024-01-01 10:00:00"), tx) }.toSeq)
      q.processAllAvailable()
      ms.addData(second.map { case (id, tx) =>
        DocStreams.AdmissionDoc(id, t("2024-01-01 10:05:00"), tx) }.toSeq)
      q.processAllAvailable()

      val streamed = spark.table("spov").as[DocStreams.SpanOverlap].collect()
        .map(a => a.doc_id -> ((a.n_tokens, a.overlap_tokens, a.flagged))).toMap
      val batch = graft.SparkEntry.queries("q180_incremental_span_overlap")(spark, d)
        .select("doc_id", "n_tokens", "overlap_tokens", "flagged")
        .collect().map(r =>
          r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

      assert(streamed.keySet == batch.keySet)
      val diverged = batch.keys.filter(k => streamed(k) != batch(k)).toSeq.sorted
      assert(diverged.isEmpty,
        diverged.take(5).map(k => s"doc $k: stream=${streamed(k)} batch=${batch(k)}").mkString("\n"))
      // the fixture exercises both outcomes
      assert(streamed.values.exists(_._3) && streamed.values.exists(!_._3),
        "corpus fixture no longer has both flagged and clean docs")
    } finally q.stop()
  }

  test("gram-less and NULL-text docs flow through with zero overlap") {
    val idxGrams = DedupQueries
      .storedGramPositions(spark, d, DedupQueries.SpanK)
      .filter(col("doc_id") % 5 =!= 0).select("gh").distinct()
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.AdmissionDoc]
    val q = DocStreams.spanOverlap(ms.toDF(), idxGrams)
      .writeStream.format("memory").queryName("spov2").outputMode("append").start()
    try {
      ms.addData(
        DocStreams.AdmissionDoc(9000001L, t("2024-01-01 10:00:00"), "just four tiny words"),
        DocStreams.AdmissionDoc(9000002L, t("2024-01-01 10:00:01"), null))
      q.processAllAvailable()
      val out = spark.table("spov2").as[DocStreams.SpanOverlap].collect()
        .map(a => a.doc_id -> a).toMap
      assert(out.keySet == Set(9000001L, 9000002L))
      assert(out(9000001L).n_tokens == 4L && out(9000001L).overlap_tokens == 0L)
      assert(out(9000002L).n_tokens == 0L && !out(9000002L).flagged)
    } finally q.stop()
  }
}
