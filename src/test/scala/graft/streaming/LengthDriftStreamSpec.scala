package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the length-drift gate: counts are pure sums, so any trigger
  * split lands on the same final row; self-referenced (the reference
  * built from the SAME corpus) every source's final drift is exactly
  * 1e6; a feed that truncates documents reads below 1e6.
  */
class LengthDriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val ref = {
    import graft.functions.TextFunctions.tokenCount
    graft.Tables.documents(spark, d)
      .select(col("source"),
        coalesce(tokenCount(col("text")).cast("long"), lit(0L)).as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("ref_docs"), sum("nt").as("ref_tokens"))
  }

  private def feed(docs: Seq[DocStreams.DriftDoc], splitAt: Int) = {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.DriftDoc]
    val name = s"drift${System.nanoTime()}"
    val q = DocStreams.lengthDriftGate(ms.toDF(), ref)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(splitAt)
      ms.addData(a)
      q.processAllAvailable()
      if (b.nonEmpty) { ms.addData(b); q.processAllAvailable() }
      // final emission per source = the row with max docs_seen
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))
        .groupBy(_._1).map { case (src, rows) => src -> rows.maxBy(_._2) }
    } finally q.stop()
  }

  private lazy val corpus = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("source"), col("text"))
    .collect().map(r => DocStreams.DriftDoc(r.getLong(0),
      t("2024-01-01 10:00:00"), r.getString(1), r.getString(2)))
    .sortBy(_.doc_id).toSeq

  test("self-referenced corpus lands on exactly 1e6 drift per source, any split") {
    Seq(corpus.length / 2, 1).foreach { split =>
      val finals = feed(corpus, split)
      val refRows = ref.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(finals.keySet == refRows.keySet)
      finals.foreach { case (src, (_, docs, toks, drift)) =>
        assert((docs, toks) == refRows(src), s"$src counts")
        assert(drift.contains(1000000L), s"$src drift $drift")
      }
    }
  }

  test("a truncating feed reads below 1e6") {
    val truncated = corpus.map(dd => dd.copy(
      text = dd.text.split("\\s+").filter(_.nonEmpty).take(5).mkString(" ")))
    val finals = feed(truncated, truncated.length / 2)
    // every source's docs are cut to <=5 tokens; corpus means are ~50+
    assert(finals.values.forall(_._4.exists(_ < 1000000L)))
  }
}
