package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.functions._

/** Reconciles the span-dedup PRODUCT with the dup-mass REPORT on the
  * same corpus (r14 verdict #7's "done" clause): q339's removable
  * spans, q354's per-source yield, and q355's re-scored LM ladder must
  * all be views of ONE underlying removable set — and that set's size
  * is pinned by q329's measure at the same grain:
  *
  *   Σ n_starts(L)  ==  dup_positions(L) − dup_groups(L)
  *
  * (keep-first removes every duplicated position except exactly one
  * keeper per group). The cut mass then reconciles across consumers:
  * q354's tokens_removed equals q339's Σ span_tokens, and q355's
  * full-vs-span_dedup train-token delta equals the train-side span
  * mass — which also proves the HOF start-coverage cut (q355) and the
  * island arithmetic (q339/q354) compute the SAME interval union.
  */
class SpanYieldReconcileSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("Σ n_starts per grain = dup_positions − dup_groups (q329's dup-mass identity)") {
    val mass = DedupQueries.storedSuffixRanks(spark, d)
      .filter(col("round").isin(5, 6))
      .groupBy("round", "r").agg(count(lit(1)).as("n"))
      .groupBy("round")
      .agg(sum(when(col("n") > 1, col("n")).otherwise(0L)).as("dup_positions"),
        count(when(col("n") > 1, 1)).as("dup_groups"))
      .collect()
      .map(r => (1L << r.getAs[Number]("round").intValue,
        r.getAs[Long]("dup_positions") - r.getAs[Long]("dup_groups")))
      .toMap
    val starts = SparkEntry.queries("q339_exact_substring_spans")(spark, d)
      .groupBy("prefix_len").agg(sum("n_starts").as("s"))
      .collect().map(r => (r.getAs[Long]("prefix_len"), r.getAs[Long]("s")))
      .toMap
    assert(starts.keySet == Set(32L, 64L))
    for ((l, s) <- starts)
      assert(s == mass(l),
        s"grain $l: q339 removable starts $s != dup_positions - dup_groups ${mass(l)}")
    assert(starts(32L) > 0, "the fixture corpus must carry 32-token duplication")
  }

  test("q354's yield totals reconcile with q339's 32-grain spans and the corpus") {
    val q354 = SparkEntry.queries("q354_span_dedup_yield")(spark, d)
      .agg(sum("tokens_total").as("tot"), sum("tokens_removed").as("cut"),
        sum("tokens_kept").as("kept"), sum("n_spans").as("spans"))
      .collect().head
    val spans32 = DedupQueries.removableSpans(spark, d, Seq(5))
      .agg(sum("span_tokens").as("cut"), count(lit(1)).as("n"))
      .collect().head
    assert(q354.getAs[Long]("cut") == spans32.getAs[Long]("cut"))
    assert(q354.getAs[Long]("spans") == spans32.getAs[Long]("n"))
    assert(q354.getAs[Long]("kept") ==
      q354.getAs[Long]("tot") - q354.getAs[Long]("cut"))
    val corpusTokens = Tables.documents(spark, d)
      .select(explode(graft.functions.TextFunctions.tokens(
        coalesce(col("text"), lit("")))).as("t"))
      .count()
    assert(q354.getAs[Long]("tot") == corpusTokens)
  }

  test("q356's per-doc cut mass sums to q354's corpus cut (row product ≡ rollup)") {
    val q356cut = SparkEntry.queries("q356_span_cut_fingerprints")(spark, d)
      .agg(sum("n_removed")).collect().head.getLong(0)
    val q354cut = SparkEntry.queries("q354_span_dedup_yield")(spark, d)
      .agg(sum("tokens_removed")).collect().head.getLong(0)
    assert(q356cut == q354cut,
      s"q356 Σ n_removed $q356cut != q354 Σ tokens_removed $q354cut")
  }

  test("q355's train-token delta equals the train-side span mass (HOF cut ≡ island union)") {
    val rows = SparkEntry.queries("q355_span_dedup_lm_impact")(spark, d)
      .select("variant", "n_train_tokens").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val trainCut = DedupQueries.removableSpans(spark, d, Seq(5))
      .filter(col("doc_id") % 5 =!= 0)
      .agg(coalesce(sum("span_tokens"), lit(0L)))
      .collect().head.getLong(0)
    assert(rows("full") - rows("span_dedup") == trainCut,
      s"ladder delta ${rows("full") - rows("span_dedup")} != train span mass $trainCut")
    assert(trainCut > 0, "the fixture corpus must cut something on the train split")
  }
}
