package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch/stream agreement for bigram-LM scoring: streaming the training
  * corpus through [[DocStreams.lmScore]] against the STORED LM must
  * reproduce q187's per-doc numbers exactly (every bigram is observed,
  * so the smoothing ladder's fallback rungs are never taken); a doc
  * with unseen tokens must walk exactly the add-1 ladder the model
  * defines instead of crashing or scoring NULL.
  */
class LmStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val lm = graft.operators.ModelPrepQueries.storedBigramLm(spark, d)

  private def stream(docs: Seq[(Long, String)], name: String): Map[Long, DocStreams.LmScore] = {
    val (bits, prefix, oov) = lm
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.AdmissionDoc]
    val q = DocStreams.lmScore(ms.toDF(), bits, prefix, oov)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      ms.addData(docs.map { case (id, tx) =>
        DocStreams.AdmissionDoc(id, t("2024-01-01 10:00:00"), tx) })
      q.processAllAvailable()
      spark.table(name).as[DocStreams.LmScore].collect()
        .map(a => a.doc_id -> a).toMap
    } finally q.stop()
  }

  test("streamed LM scoring == q187 batch over the training corpus") {
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val streamed = stream(docs, "lmsc")
    val batch = graft.SparkEntry.queries("q187_bigram_lm_score")(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getBoolean(3))))).toMap
    assert(streamed.keySet == batch.keySet)
    val diverged = batch.keys.filter { k =>
      val s = streamed(k)
      (s.n_bigrams, s.bits_per_bigram, s.kept) != batch(k)
    }.toSeq.sorted
    assert(diverged.isEmpty, diverged.take(5).map(k =>
      s"doc $k: stream=${streamed(k)} batch=${batch(k)}").mkString("\n"))
    assert(streamed.values.exists(_.kept.contains(true)) &&
      streamed.values.exists(_.kept.contains(false)))
  }

  test("unseen tokens walk the add-1 ladder: pair miss, prefix miss, full OOV") {
    val (bits, prefix, oov) = lm
    // a (w1, w2) the corpus really contains, to borrow its prefix
    val (w1, w2, pairMicro) = bits.orderBy("w1", "w2").limit(1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).head
    val missMicro = prefix.filter(col("w1") === w1)
      .collect().map(_.getLong(1)).head
    val out = stream(Seq(
      1L -> s"$w1 $w2",            // observed pair → stored micro_bits
      2L -> s"$w1 zzzunseen",      // seen prefix, new continuation → miss_micro
      3L -> "zzzunseen qqqunseen", // fully OOV prefix → log2(V)
      4L -> "solo",                // one token → no bigram, NULL score
      5L -> null.asInstanceOf[String]), "lmoov")
    assert(out(1L).micro_sum == pairMicro && out(1L).n_bigrams == 1L)
    assert(out(2L).micro_sum == missMicro)
    assert(out(3L).micro_sum == oov)
    assert(out(4L) == out(4L).copy(n_bigrams = 0L, micro_sum = 0L,
      bits_per_bigram = None, kept = None))
    assert(out(5L).n_bigrams == 0L && out(5L).kept.isEmpty)
  }
}
