package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The gram-novelty gate's three contracts: (1) the final estimate is
  * FEED-SPLIT-INVARIANT (register max-folds commute, so any trigger
  * partition of the same docs lands identical registers); (2) the
  * per-trigger novel_est telescopes exactly to the final estimate;
  * (3) the final estimate tracks the EXACT per-source distinct-gram
  * count within the portable-HLL error envelope (raw regime 3.8σ =
  * 35%, linear-counting floor 8 — the SketchAccuracySpec convention).
  */
class GramNoveltyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def feed() = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("source"), col("text")).collect()
    .map(r => DocStreams.HllDoc(r.getLong(0),
      new Timestamp(1700000000000L + r.getLong(0) * 1000L),
      r.getString(1), r.getString(2)))
    .sortBy(_.doc_id).toSeq

  private def run(slices: Seq[Seq[DocStreams.HllDoc]], name: String) = {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.HllDoc]
    val q = DocStreams.gramNoveltyGate(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try slices.foreach { s => ms.addData(s); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[DocStreams.NovEstimate].collect()
  }

  test("final estimate is trigger-split invariant and novelty telescopes") {
    val docs = feed()
    val twoWay = run(Seq(docs.take(docs.size / 2), docs.drop(docs.size / 2)), "nov2")
    val fiveWay = run(docs.grouped(math.max(1, docs.size / 5)).toSeq, "nov5")
    def finals(rows: Array[DocStreams.NovEstimate]) =
      rows.groupBy(_.source).map { case (s, rs) =>
        s -> rs.maxBy(_.n_docs_seen).est_after }
    assert(finals(twoWay) == finals(fiveWay),
      "different trigger splits must land identical final registers")
    // telescoping: sum of per-trigger novelty == final estimate, per source
    fiveWay.groupBy(_.source).foreach { case (s, rs) =>
      assert(rs.map(_.novel_est).sum == rs.maxBy(_.n_docs_seen).est_after,
        s"$s: novelty increments must telescope to the final estimate")
    }
  }

  test("final estimate tracks the exact per-source distinct-gram count within HLL bounds") {
    import graft.functions.TextFunctions.wordNgrams
    val exact = graft.Tables.documents(spark, d)
      .select(col("source"), explode(wordNgrams(col("text"), 3)).as("g"))
      .groupBy("source").agg(countDistinct("g").as("nd"))
      .as[(String, Long)].collect().toMap
    val got = run(Seq(feed()), "novacc")
      .groupBy(_.source).map { case (s, rs) =>
        s -> rs.maxBy(_.n_docs_seen).est_after }
    assert(got.keySet == exact.keySet)
    got.foreach { case (s, est) =>
      val nd = exact(s)
      assert(math.abs(est - nd) <= math.max(8L, (nd * 0.35).toLong),
        s"$s: estimate $est vs exact $nd outside the HLL envelope")
    }
  }
}
