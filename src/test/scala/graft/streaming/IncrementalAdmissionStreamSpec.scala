package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.DedupQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch/stream agreement for the incremental-index admission: streaming
  * today's docs one micro-batch at a time through
  * [[DocStreams.incrementalAdmission]] — against the SAME stored band
  * index q148 reads — must reproduce q148's per-doc verdict exactly
  * (partner count, best partner, best agreement, admitted flag), because
  * both paths share the portable sig/digest/agreement builders.
  */
class IncrementalAdmissionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  test("streamed admission == q148 batch verdicts on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, d)
    val bandIndex = DedupQueries.storedBandIndex(spark, d)
    val idxSigs = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id").as("idx_id"),
        graft.functions.HashFunctions
          .portableMinhashSigNative(col("text"), 3, DedupQueries.PortK).as("mh"))

    val newDocs = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy(_._1)
    assert(newDocs.nonEmpty)

    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.AdmissionDoc]
    val q = DocStreams.incrementalAdmission(ms.toDF(), bandIndex, idxSigs)
      .writeStream.format("memory").queryName("adm").outputMode("append").start()
    try {
      // two triggers: the verdict must not depend on arrival batching
      val (first, second) = newDocs.splitAt(newDocs.length / 2)
      ms.addData(first.map { case (id, tx) =>
        DocStreams.AdmissionDoc(id, t("2024-01-01 10:00:00"), tx) }.toSeq)
      q.processAllAvailable()
      ms.addData(second.map { case (id, tx) =>
        DocStreams.AdmissionDoc(id, t("2024-01-01 10:05:00"), tx) }.toSeq)
      q.processAllAvailable()

      val streamed = spark.table("adm").as[DocStreams.Admission].collect()
        .map(a => a.doc_id ->
          ((a.n_index_partners, a.best_index_partner, a.best_match, a.admitted)))
        .toMap

      val batch = graft.SparkEntry.queries("q148_incremental_dedup")(spark, d)
        .select(col("doc_id"), col("n_index_partners"), col("best_index_partner"),
          (col("best_jaccard") * DedupQueries.PortK).cast("long").as("best_match"),
          col("admitted"))
        .collect().map { r =>
          r.getLong(0) -> ((r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            r.getBoolean(4)))
        }.toMap

      assert(streamed.keySet == batch.keySet,
        s"doc coverage differs: only-stream=${streamed.keySet -- batch.keySet} only-batch=${batch.keySet -- streamed.keySet}")
      val diverged = batch.keys.filter(k => streamed(k) != batch(k)).toSeq.sorted
      assert(diverged.isEmpty,
        diverged.take(5).map(k => s"doc $k: stream=${streamed(k)} batch=${batch(k)}").mkString("\n"))
      // the fixture actually exercises both outcomes
      assert(streamed.values.exists(_._4) && streamed.values.exists(!_._4),
        "corpus fixture no longer has both admitted and rejected docs")
    } finally q.stop()
  }

  test("no-candidate and gram-less docs flow through and are admitted") {
    val bandIndex = DedupQueries.storedBandIndex(spark, d)
    val idxSigs = graft.Tables.documents(spark, d).filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id").as("idx_id"),
        graft.functions.HashFunctions
          .portableMinhashSigNative(col("text"), 3, DedupQueries.PortK).as("mh"))
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.AdmissionDoc]
    val q = DocStreams.incrementalAdmission(ms.toDF(), bandIndex, idxSigs)
      .writeStream.format("memory").queryName("adm2").outputMode("append").start()
    try {
      ms.addData(
        // novel text: no banding collision with the index
        DocStreams.AdmissionDoc(9000001L, t("2024-01-01 10:00:00"),
          "zzq wqx vbn mlk pqr stu zzq wqx vbn"),
        // fewer than 3 tokens: gram-less, all-null digests
        DocStreams.AdmissionDoc(9000002L, t("2024-01-01 10:00:01"), "xy zk"))
      q.processAllAvailable()
      val out = spark.table("adm2").as[DocStreams.Admission].collect()
        .map(a => a.doc_id -> a).toMap
      assert(out.keySet == Set(9000001L, 9000002L))
      assert(out.values.forall(a =>
        a.admitted && a.n_index_partners == 0L && a.best_index_partner.isEmpty))
    } finally q.stop()
  }
}
