package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.DedupQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch/stream agreement for the exact-substring admission gate:
  * streaming the arriving (doc_id % 5 == 0) docs through
  * [[DocStreams.exactSubstringGate]] against the SAME stored gpos16
  * window-digest inventory q340 reads must reproduce q340's per-doc
  * verdicts exactly — window digests, island merge (gap ≤ L), covered
  * tokens, longest run, and the 2L-run/half-mass flag all shared math.
  */
class ExactSubstringGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private val L = 16
  private def t(s: String) = Timestamp.valueOf(s)

  test("streamed exact-substring gate == q340 batch on the sf0.001 corpus") {
    val g = DedupQueries.storedGramPositions(spark, d, L)
    val inv = g.filter(col("doc_id") % 5 =!= 0).select("gh").distinct()

    val newDocs = graft.Tables.documents(spark, d)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().sortBy(_._1)
    assert(newDocs.nonEmpty)

    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.AdmissionDoc]
    val q = DocStreams.exactSubstringGate(ms.toDF(), inv, L)
      .writeStream.format("memory").queryName("esgate").outputMode("append").start()
    try {
      val (first, second) = newDocs.splitAt(newDocs.length / 2)
      ms.addData(first.map { case (id, tx) =>
        DocStreams.AdmissionDoc(id, t("2024-01-01 10:00:00"), tx) }.toSeq)
      q.processAllAvailable()
      ms.addData(second.map { case (id, tx) =>
        DocStreams.AdmissionDoc(id, t("2024-01-01 10:05:00"), tx) }.toSeq)
      q.processAllAvailable()

      val streamed = spark.table("esgate").as[DocStreams.ExactSubVerdict].collect()
        .map(a => a.doc_id -> ((a.n_tokens, a.n_windows, a.n_dup_windows,
          a.covered_tokens, a.longest_run_tokens, a.flagged))).toMap
      val batch = graft.SparkEntry.queries("q340_exact_substring_admission")(spark, d)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap

      assert(streamed.keySet == batch.keySet)
      val diverged = batch.keys.filter(k => streamed(k) != batch(k)).toSeq.sorted
      assert(diverged.isEmpty,
        diverged.take(5).map(k => s"doc $k: stream=${streamed(k)} batch=${batch(k)}").mkString("\n"))
      // the fixture exercises both outcomes and a real long run
      assert(streamed.values.exists(_._6) && streamed.values.exists(!_._6),
        "corpus fixture no longer has both flagged and clean arrivals")
      assert(streamed.values.exists(_._5 >= 2L * L),
        "no arrival carries a full 2L-token duplicated run — flag rule untested")

      // r14 verdict #8: the emitted CUT geometry (runs ≥ 2L = full
      // q339-grain copies) must equal the batch island rule's intervals
      // computed from the same stored inventory — so intake can CUT on
      // the stream and land exactly where the batch pass would
      val verdicts = spark.table("esgate").as[DocStreams.ExactSubVerdict]
        .collect()
      val streamedCuts = verdicts
        .map(v => v.doc_id -> v.cut_spans.map(s => (s.start, s.end)).sorted)
        .toMap
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val batchCuts = g.filter(col("doc_id") % 5 === 0)
        .join(inv, Seq("gh"), "left_semi")
        .select("doc_id", "pos")
        .withColumn("b", when(col("pos") - lag("pos", 1).over(w) <= L, 0L)
          .otherwise(1L))
        .withColumn("grp", sum("b").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("doc_id", "grp")
        .agg(min("pos").as("s"), (max("pos") + L).as("e"))
        .filter(col("e") - col("s") >= 2L * L)
        .collect().map(r => (r.getAs[Number]("doc_id").longValue,
          (r.getAs[Number]("s").longValue, r.getAs[Number]("e").longValue)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSeq.sorted }
      for (id <- streamed.keys) {
        val got = streamedCuts.getOrElse(id, Seq.empty)
        val exp = batchCuts.getOrElse(id, Seq.empty)
        assert(got == exp, s"doc $id cut spans: stream=$got batch=$exp")
      }
      assert(batchCuts.nonEmpty, "fixture carries no cut-worthy runs")
      // cut bookkeeping coheres with the verdict's aggregates
      for (v <- verdicts) {
        assert(v.cut_tokens == v.cut_spans.map(s => s.end - s.start).sum)
        assert((v.longest_run_tokens >= 2L * L) == v.cut_spans.nonEmpty,
          s"doc ${v.doc_id}: longest-run flag and cut list disagree")
      }
    } finally q.stop()
  }

  test("window-less and NULL-text docs flow through with zeros, unflagged") {
    val inv = DedupQueries.storedGramPositions(spark, d, L)
      .filter(col("doc_id") % 5 =!= 0).select("gh").distinct()
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.AdmissionDoc]
    val q = DocStreams.exactSubstringGate(ms.toDF(), inv, L)
      .writeStream.format("memory").queryName("esgate2").outputMode("append").start()
    try {
      ms.addData(Seq(
        DocStreams.AdmissionDoc(9001L, t("2024-01-01 10:00:00"), "too short"),
        DocStreams.AdmissionDoc(9002L, t("2024-01-01 10:00:00"), null)))
      q.processAllAvailable()
      val got = spark.table("esgate2").as[DocStreams.ExactSubVerdict].collect()
        .map(a => a.doc_id -> a).toMap
      assert(got.keySet == Set(9001L, 9002L))
      assert(got(9001L).n_tokens == 2 && got(9001L).n_windows == 0 &&
        got(9001L).covered_tokens == 0 && !got(9001L).flagged)
      assert(got(9002L).n_tokens == 0 && !got(9002L).flagged)
    } finally q.stop()
  }
}
