package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch/stream agreement for the SEMANTIC decontamination gate:
  * streaming the training pool one micro-batch at a time through
  * [[VecStreams.semanticDecontamGate]] — against the SAME stored
  * codebook and eval assignment q198 uses — must reproduce q198's
  * per-vector (c_id, n_eval_close, contaminated) exactly, because both
  * paths share the quantization, the argmax and the integer threshold.
  */
class VecDecontamStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  test("streamed decontam verdicts == q198 batch on the sf0.001 pool") {
    val (cents, evalByCluster) =
      graft.operators.SimilarityQueries.decontamEvalSide(spark, d)
    assert(cents.nonEmpty && evalByCluster.nonEmpty)
    val pool = graft.Tables.embeddings(spark, d)
      .filter(col("vec_id") % 20 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(pool.nonEmpty)

    implicit val sq = spark.sqlContext
    val ms = MemoryStream[VecStreams.Vec]
    val q = VecStreams.semanticDecontamGate(ms.toDF(), cents, evalByCluster)
      .writeStream.format("memory").queryName("vdecon").outputMode("append").start()
    try {
      // two triggers: a stateless gate must be batching-invariant
      val (first, second) = pool.splitAt(pool.length / 2)
      ms.addData(first.map { case (id, e) =>
        VecStreams.Vec(id, t("2024-01-01 10:00:00"), e) }.toSeq)
      q.processAllAvailable()
      ms.addData(second.map { case (id, e) =>
        VecStreams.Vec(id, t("2024-01-01 10:05:00"), e) }.toSeq)
      q.processAllAvailable()

      val streamed = spark.table("vdecon").as[VecStreams.DecontamVerdict]
        .collect()
        .map(x => x.vec_id -> ((x.c_id.toLong, x.n_eval_close, x.contaminated)))
        .toMap
      val batch = graft.SparkEntry.queries("q198_semantic_decontam")(spark, d)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
        .toMap

      assert(streamed.keySet == batch.keySet,
        s"coverage differs: only-stream=${streamed.keySet -- batch.keySet} " +
          s"only-batch=${batch.keySet -- streamed.keySet}")
      val diverged = batch.keys.filter(k => streamed(k) != batch(k)).toSeq.sorted
      assert(diverged.isEmpty,
        diverged.take(5).map(k => s"vec $k: stream=${streamed(k)} batch=${batch(k)}")
          .mkString("\n"))
      assert(streamed.values.exists(_._3) && streamed.values.exists(!_._3),
        "fixture no longer exercises both contaminated and clean vectors")
    } finally q.stop()
  }

  test("malformed vectors flow through unflagged — never kill the stream") {
    val cents: Array[(Int, Array[Long])] = Array(
      0 -> Array(10000L, 0L), 1 -> Array(0L, 10000L))
    val evalByCluster = Map(
      0 -> Seq((100L, Array(10000L, 100L))))
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[VecStreams.Vec]
    val q = VecStreams.semanticDecontamGate(ms.toDF(), cents, evalByCluster)
      .writeStream.format("memory").queryName("vdecon2").outputMode("append").start()
    try {
      ms.addData(Seq(
        VecStreams.Vec(1L, t("2024-01-01 10:00:00"), Seq(1.0f, 0.05f)), // close to eval
        VecStreams.Vec(2L, t("2024-01-01 10:00:00"), Seq(Float.NaN, Float.NaN)),
        VecStreams.Vec(3L, t("2024-01-01 10:00:00"), Seq(1.0f)), // wrong dim
        VecStreams.Vec(4L, t("2024-01-01 10:00:00"), Seq(0.0f, 1.0f)))) // other cluster
      q.processAllAvailable()
      val out = spark.table("vdecon2").as[VecStreams.DecontamVerdict].collect()
        .map(x => x.vec_id -> ((x.n_eval_close, x.contaminated))).toMap
      assert(out(1L) == ((1L, true)), s"clean close vector must flag: $out")
      assert(out(2L) == ((0L, false)), s"NaN vector must pass unflagged: $out")
      assert(out(3L) == ((0L, false)), s"wrong-dim vector must pass unflagged: $out")
      assert(out(4L) == ((0L, false)), s"other-cluster vector must pass: $out")
    } finally q.stop()
  }
}
