package graft

import org.apache.spark.sql.functions._

/** PlanAudit.boundedBroadcasts must actually DISCRIMINATE — a guard that
  * is vacuously true would let the q136/q154/q155 anti-pattern (a HINTED
  * broadcast of a raw corpus-table projection: a driver-side collect in
  * disguise) creep back in unflagged. Each case builds the hint shape
  * directly from the testdata tables the rule protects.
  */
class BroadcastAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def audited(df: org.apache.spark.sql.DataFrame): Boolean =
    PlanAudit.boundedBroadcasts(df.queryExecution.optimizedPlan)

  // NOTE for the "flags" cases: the probe side must carry NO predicate
  // on the join key — Catalyst propagates key constraints through inner
  // joins, so `probe.filter(key % 50 = 0) ⋈ broadcast(corpus)` ends up
  // with the filter INSIDE the broadcast subtree and is genuinely
  // bounded. The shape the audit exists to catch is the one q136/q154
  // actually had: the probe's smallness comes from an upstream
  // aggregation/window, which propagates nothing onto the corpus side.

  test("flags a broadcast of a bare embeddings projection (the old q154 shape)") {
    val truth = Tables.embeddings(spark, d).select(col("vec_id"), col("label"))
    // aggregated probe: small by construction, but no key constraint
    // Catalyst could push into the broadcast side
    val probe = Tables.embeddings(spark, d)
      .groupBy(col("label")).agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"))
    assert(!audited(probe.join(broadcast(truth), Seq("vec_id"))),
      "an unbounded corpus broadcast must be flagged")
  }

  test("flags a broadcast of a bare documents projection") {
    val all = Tables.documents(spark, d).select(col("doc_id"), col("source"))
    val probe = Tables.documents(spark, d)
      .groupBy(col("source")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    assert(!audited(probe.join(broadcast(all), Seq("doc_id"))))
  }

  test("flags a corpus enriched with an aggregated side table (bounding must be ON the path)") {
    // the aggregate bounds the stats side, NOT the corpus rows that
    // ship — subtree-wide exists(bounding) would wrongly exempt this
    val stats = Tables.documents(spark, d)
      .groupBy("source").agg(count(lit(1)).as("n"))
    val enriched = Tables.documents(spark, d)
      .select(col("doc_id"), col("source")).join(stats, Seq("source"))
    val probe = Tables.documents(spark, d)
      .groupBy(col("lang")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    assert(!audited(probe.join(broadcast(enriched), Seq("doc_id"))))
  }

  test("accepts a broadcast bounded by a filter (the query-set shape)") {
    val q = Tables.embeddings(spark, d)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val corpus = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    assert(audited(corpus.crossJoin(broadcast(q))))
  }

  test("accepts a broadcast bounded by an aggregation") {
    val stats = Tables.embeddings(spark, d)
      .groupBy("label").agg(count(lit(1)).as("n"))
    val corpus = Tables.embeddings(spark, d).select(col("vec_id"), col("label"))
    assert(audited(corpus.join(broadcast(stats), Seq("label"))))
  }

  test("accepts the fixed q154/q136 orientation (bounded side broadcast, corpus streamed)") {
    val small = Tables.embeddings(spark, d)
      .filter(col("vec_id") % 50 === 0).select(col("vec_id"))
    val truth = Tables.embeddings(spark, d).select(col("vec_id"), col("label"))
    assert(audited(broadcast(small).join(truth, Seq("vec_id"))))
  }

  test("exempts un-hinted joins — a stats-chosen broadcast flips to shuffle at scale") {
    val a = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val b = Tables.documents(spark, d).select(col("doc_id"), col("source"))
    // no hint: at sf the planner broadcasts this on size alone, which is
    // fine — real-data statistics (and AQE) pick a shuffle join instead
    assert(audited(a.join(b, Seq("doc_id"))))
  }

  test("ignores broadcasts of non-corpus tables (dims stay broadcastable)") {
    val dim = Tables.nation(spark, d)
    val fact = Tables.customer(spark, d)
    assert(audited(fact.join(broadcast(dim),
      fact("c_nationkey") === dim("n_nationkey"))))
  }
}
