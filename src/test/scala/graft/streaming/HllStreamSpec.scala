package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the HLL cardinality gate, and the property that
  * makes a register sketch the RIGHT streaming shape: feeding the
  * corpus in REVERSE doc_id order across two triggers — and then
  * REPLAYING the whole corpus a second time — both land on q224's
  * batch estimate bit-for-bit, because register max is idempotent,
  * commutative and monotone. State never grows past 128 longs per
  * source.
  */
class HllStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val batch: Map[String, (Long, Long, Long)] =
    graft.SparkEntry.queries("q224_portable_hll")(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  private lazy val corpus: Seq[DocStreams.HllDoc] =
    graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => DocStreams.HllDoc(r.getLong(0),
        t("2024-01-01 10:00:00"), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(-_.doc_id).toSeq // REVERSE order: registers must not care

  private def latestPerSource(table: String): Map[String, DocStreams.HllEstimate] =
    spark.table(table).as[DocStreams.HllEstimate].collect()
      .groupBy(_.source).map { case (s, rs) =>
        s -> rs.maxBy(_.n_docs_seen)
      }

  test("reverse-order two-trigger stream converges to q224's batch estimate") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.HllDoc]
    val q = DocStreams.hllGate(ms.toDF())
      .writeStream.format("memory").queryName("hllg")
      .outputMode("append").start()
    try {
      val (first, second) = corpus.splitAt(corpus.length / 3)
      ms.addData(first)
      q.processAllAvailable()
      ms.addData(second)
      q.processAllAvailable()
      val got = latestPerSource("hllg")
      assert(got.keySet == batch.keySet)
      val diverged = batch.keys.filter { s =>
        (got(s).n_empty, got(s).est_hll) != ((batch(s)._2, batch(s)._3))
      }
      assert(diverged.isEmpty, diverged.take(5).map(s =>
        s"$s: stream=(${got(s).n_empty},${got(s).est_hll}) " +
          s"batch=(${batch(s)._2},${batch(s)._3})").mkString("\n"))
    } finally q.stop()
  }

  test("full replay of the corpus leaves every estimate unchanged (idempotent registers)") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.HllDoc]
    val q = DocStreams.hllGate(ms.toDF())
      .writeStream.format("memory").queryName("hllg2")
      .outputMode("append").start()
    try {
      ms.addData(corpus)
      q.processAllAvailable()
      val before = latestPerSource("hllg2").map { case (s, e) =>
        s -> ((e.n_empty, e.est_hll)) }
      ms.addData(corpus) // exact replay — a re-crawl, a backfill
      q.processAllAvailable()
      val after = latestPerSource("hllg2").map { case (s, e) =>
        s -> ((e.n_empty, e.est_hll)) }
      assert(before == after)
      // and the replay doubled the doc counter — state really advanced
      val counts = corpus.groupBy(_.source)
        .map { case (s, ds) => s -> ds.size.toLong }
      val seen = latestPerSource("hllg2")
      assert(seen.nonEmpty && seen.forall { case (s, e) =>
        e.n_docs_seen == 2L * counts(s) })
    } finally q.stop()
  }
}
