package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.functions._

/** Pins the two streaming-gate audits (r9 verdict task 7) to the gates
  * they audit, on real sf0.001 data:
  *
  *  - q216 (admission recall): its admitted side must BE q148's kept
  *    set — every cross pair the audit counts as caught implies q148
  *    reports that new doc as non-admitted (n_index_partners > 0) —
  *    and identical docs (Jaccard decile 10 ⇒ identical gram sets ⇒
  *    identical MinHash signatures) must always be caught.
  *  - q217 (span-gate operating curve): the 5-gram gate can never flag
  *    below true-coverage decile 5 (every 5-gram match is covered by
  *    its own 3-subgram matches, so ov5 ≤ ov3), and the audit's total
  *    flag count must equal batch q180's — the gate the audit claims
  *    to describe (q180 ≡ the streaming gate per SpanOverlapStreamSpec,
  *    so the chain audit → q180 → stream is closed).
  */
class StreamingGateAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q216: caught cross pairs are exactly docs q148 reports non-admitted") {
    val caught = DedupQueries.portableScoredPairs(spark, d)
      .filter(col("n_match") >= DedupQueries.PortMatchMin)
      .filter((col("ia") % 5 === 0) =!= (col("ib") % 5 === 0))
      .select(when(col("ia") % 5 === 0, col("ia")).otherwise(col("ib"))
        .as("new_id"))
      .distinct().collect().map(_.getLong(0)).toSet
    val flaggedByGate = DedupQueries.q148.fn(spark, d)
      .filter(col("n_index_partners") > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(caught == flaggedByGate,
      s"audit admitted-side diverged from q148: only-audit=${caught -- flaggedByGate}, " +
        s"only-gate=${flaggedByGate -- caught}")
  }

  test("q216: identical documents (decile 10) are always caught") {
    val rows = DedupQueries.q216.fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(rows.nonEmpty, "audit produced no deciles at sf0.001")
    rows.get(10L).foreach(ppm =>
      assert(ppm == 1000000L, s"decile-10 recall must be 1e6, got $ppm"))
  }

  test("q217: the 5-gram gate never flags below true-coverage decile 5, and " +
      "its flag total equals batch q180's") {
    val audit = DedupQueries.q217.fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(audit.nonEmpty)
    audit.filter(_._1 < 5).foreach { case (dec, _, flagged) =>
      assert(flagged == 0L, s"gate flagged $flagged docs at true decile $dec")
    }
    val auditFlags = audit.map(_._3).sum
    val q180Flags = DedupQueries.q180.fn(spark, d)
      .filter(col("flagged") && col("n_tokens") > 0).count()
    assert(auditFlags == q180Flags,
      s"audit counts $auditFlags flags, the gate (q180) flags $q180Flags")
  }
}
