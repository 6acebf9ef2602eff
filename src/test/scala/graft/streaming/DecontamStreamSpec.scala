package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch/stream agreement for the decontamination gate: streaming the
  * non-eval corpus one micro-batch at a time through
  * [[DocStreams.decontamGate]] — against the SAME eval gram set q118
  * derives — must reproduce q118's per-doc (n_hits, contaminated)
  * exactly, because both paths share the distinct-4-gram identity.
  */
class DecontamStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  test("streamed decontam verdicts == q118 batch on the sf0.001 corpus") {
    val evalGrams = graft.operators.CurationQueries.evalGramHashes(spark, d)
    val docs = graft.Tables.documents(spark, d)
      .filter(col("source") =!= "src0")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy(_._1)
    assert(docs.nonEmpty)

    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.Doc]
    val q = DocStreams.decontamGate(ms.toDF(), evalGrams)
      .writeStream.format("memory").queryName("decon").outputMode("append").start()
    try {
      // two triggers: the verdict must not depend on arrival batching
      val (first, second) = docs.splitAt(docs.length / 2)
      ms.addData(first.map { case (id, tx) =>
        DocStreams.Doc(id, t("2024-01-01 10:00:00"), tx) }.toSeq)
      q.processAllAvailable()
      ms.addData(second.map { case (id, tx) =>
        DocStreams.Doc(id, t("2024-01-01 10:05:00"), tx) }.toSeq)
      q.processAllAvailable()

      val streamed = spark.table("decon").as[DocStreams.Decontam].collect()
        .map(x => x.doc_id -> ((x.n_hits, x.contaminated))).toMap
      val batch = graft.SparkEntry.queries("q118_ngram_decontam")(spark, d)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

      assert(streamed.keySet == batch.keySet,
        s"doc coverage differs: only-stream=${streamed.keySet -- batch.keySet} only-batch=${batch.keySet -- streamed.keySet}")
      val diverged = batch.keys.filter(k => streamed(k) != batch(k)).toSeq.sorted
      assert(diverged.isEmpty,
        diverged.take(5).map(k => s"doc $k: stream=${streamed(k)} batch=${batch(k)}").mkString("\n"))
      // the fixture exercises both outcomes
      assert(streamed.values.exists(_._2) && streamed.values.exists(!_._2),
        "corpus fixture no longer has both contaminated and clean docs")
    } finally q.stop()
  }

  test("NULL-text and gram-less docs flow through unflagged") {
    val evalGrams = graft.operators.CurationQueries.evalGramHashes(spark, d)
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.Doc]
    val q = DocStreams.decontamGate(ms.toDF(), evalGrams)
      .writeStream.format("memory").queryName("decon2").outputMode("append").start()
    try {
      ms.addData(Seq(
        DocStreams.Doc(1L, t("2024-01-01 10:00:00"), null),
        DocStreams.Doc(2L, t("2024-01-01 10:00:00"), "too short"), // < 4 tokens
        DocStreams.Doc(3L, t("2024-01-01 10:00:00"), "")))
      q.processAllAvailable()
      val out = spark.table("decon2").as[DocStreams.Decontam].collect()
        .map(x => x.doc_id -> ((x.n_hits, x.contaminated))).toMap
      assert(out == Map(1L -> ((0L, false)), 2L -> ((0L, false)), 3L -> ((0L, false))),
        s"degenerate docs must flow unflagged: $out")
    } finally q.stop()
  }
}
