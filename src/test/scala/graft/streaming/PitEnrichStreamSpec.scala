package graft.streaming

import java.sql.{Date, Timestamp}

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the point-in-time SCD2 enrichment gate: every
  * order probe streamed through [[EventStreams.pitEnrich]] against the
  * SHARED `scd2Versions` dimension must resolve exactly the era q138's
  * batch as-of join resolves — including probes whose date precedes
  * every version (NULL era, the LEFT semantics) and same-day version
  * ties (max version wins in the shared dedup). A crafted feed pins
  * the future-version edge the join predicate must not drop.
  */
class PitEnrichStreamSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def t(s: String) = Timestamp.valueOf(s)

  final case class Probe(o_orderkey: Long, ts: Timestamp, o_custkey: Long,
      o_orderdate: Date, o_orderstatus: String)

  test("streamed PIT enrichment == q138 batch over the full orders probe set") {
    implicit val sq = spark.sqlContext
    val vers = graft.operators.ExtensionQueries.scd2Versions(spark, d)
    val probes = graft.Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        col("o_orderstatus"))
      .collect().map(r => Probe(r.getLong(0), t("2024-01-01 10:00:00"),
        r.getLong(1), Date.valueOf(r.getString(2)), r.getString(3)))
    val ms = MemoryStream[Probe]
    val q = EventStreams.pitEnrich(ms.toDF(), vers)
      .writeStream.format("memory").queryName("pitg")
      .outputMode("append").start()
    try {
      val (first, second) = probes.splitAt(probes.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(second.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("pitg").as[EventStreams.PitEnriched]
        .collect().map(e => e.o_orderkey ->
          ((e.version, e.era_status, e.status_matches))).toMap
      val batch = graft.SparkEntry.queries("q138_scd2_pit_join")(spark, d)
        .collect().map { r =>
          r.getLong(0) -> ((
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            if (r.isNullAt(4)) None else Some(r.getString(4)),
            if (r.isNullAt(5)) None else Some(r.getBoolean(5))))
        }.toMap
      assert(streamed.keySet == batch.keySet)
      val diverged = batch.keys.filter(k => streamed(k) != batch(k)).toSeq.sorted
      assert(diverged.isEmpty, diverged.take(5).map(k =>
        s"order $k: stream=${streamed(k)} batch=${batch(k)}").mkString("\n"))
      // non-vacuous: eras resolve, and the same-day-twin case (q138's
      // status_matches = false) occurs; the NULL-era path is covered by
      // the crafted future-version test below (this corpus's history
      // derives FROM orders, so every probe has an era at its own date)
      assert(streamed.values.exists(_._1.isDefined))
      assert(streamed.values.exists(_._3.contains(false)))
      assert(streamed.values.exists(_._3.contains(true)))
    } finally q.stop()
  }

  test("a probe whose versions are all in the future keeps its row with NULL era") {
    implicit val sq = spark.sqlContext
    val vers = Seq((99L, Date.valueOf("2030-01-01"), 1L, "F"))
      .toDF("o_custkey", "eff_from", "version", "era_status")
    val ms = MemoryStream[Probe]
    val q = EventStreams.pitEnrich(ms.toDF(), vers)
      .writeStream.format("memory").queryName("pitfut")
      .outputMode("append").start()
    try {
      ms.addData(Seq(
        Probe(1, t("2024-01-01 10:00:00"), 99, Date.valueOf("2024-06-01"), "O"),
        Probe(2, t("2024-01-01 10:00:00"), 77, Date.valueOf("2024-06-01"), "O")))
      q.processAllAvailable()
      val out = spark.table("pitfut").as[EventStreams.PitEnriched]
        .collect().map(e => e.o_orderkey -> e).toMap
      assert(out.keySet == Set(1L, 2L))
      assert(out(1L).version.isEmpty && out(1L).era_status.isEmpty &&
        out(1L).status_matches.isEmpty)
      assert(out(2L).version.isEmpty)
    } finally q.stop()
  }
}
