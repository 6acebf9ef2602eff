package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch/stream agreement for the entity-key collision gate: arriving
  * keys checked through [[DocStreams.keyCollisionGate]] against a static
  * inventory must reproduce the batch deletion-neighborhood join
  * (q310's shared `keyVariants` + positional witness) exactly — both
  * verdict outcomes exercised, arrival batching irrelevant, and the
  * ins/del/sub edit classes each witnessed.
  */
class KeyCollisionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val inventory = Seq(
    (1L, "Widget-A01"), (2L, "Widget-B02"), (3L, "Gadget-7"))

  private val arrivals = Seq(
    (10L, "Widget-A11"),  // substitution vs 1 → collide
    (11L, "Widget-A0"),   // deletion vs 1 → collide
    (12L, "Gadget-77"),   // insertion vs 3 → collide
    (13L, "Sprocket-9"),  // clean → admit
    (14L, "Widget-B02"))  // IDENTICAL name: distance 0, NOT 1 → admit

  test("streamed collision verdicts == batch deletion-neighborhood join") {
    val idx = inventory.toDF("k", "nm")
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.KeyRow]
    val q = DocStreams.keyCollisionGate(ms.toDF(), idx)
      .writeStream.format("memory").queryName("keycol").outputMode("append")
      .start()
    try {
      val (first, second) = arrivals.splitAt(2)
      ms.addData(first.map { case (k, nm) =>
        DocStreams.KeyRow(k, t("2024-01-01 10:00:00"), nm) })
      q.processAllAvailable()
      ms.addData(second.map { case (k, nm) =>
        DocStreams.KeyRow(k, t("2024-01-01 10:05:00"), nm) })
      q.processAllAvailable()

      val streamed = spark.table("keycol").as[DocStreams.KeyCollision]
        .collect()
        .map(x => x.k -> ((x.n_collisions, x.nearest_key, x.admitted))).toMap

      // batch expectation through the SAME shared helpers
      val av = graft.operators.DedupQueries.keyVariants(
        arrivals.toDF("k", "nm")).alias("a")
      val iv = graft.operators.DedupQueries.keyVariants(idx)
        .select(col("v"), col("pos").as("idx_pos"),
          col("k").as("idx_k"), col("nm").as("idx_nm")).alias("b")
      val pairs = av.join(iv, Seq("v"))
        .filter(col("a.nm") =!= col("idx_nm") &&
          graft.operators.DedupQueries.witnessPred(col("a.pos"), col("idx_pos")))
        .select(col("a.k").as("k"), col("idx_k")).distinct()
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      val batch = arrivals.map { case (k, _) =>
        val ps = pairs.getOrElse(k, Seq.empty)
        k -> ((ps.size.toLong,
          if (ps.isEmpty) None else Some(ps.min), ps.isEmpty))
      }.toMap

      assert(streamed == batch,
        s"stream/batch diverged:\n stream=$streamed\n batch=$batch")
      // the fixture exercises both verdicts and all three edit classes
      assert(streamed(10L)._3 == false && streamed(11L)._3 == false &&
        streamed(12L)._3 == false)
      assert(streamed(13L)._3 == true)
      // an identical name is distance 0, not 1 — must ADMIT
      assert(streamed(14L)._3 == true, "distance-0 twin wrongly flagged")
    } finally q.stop()
  }
}
