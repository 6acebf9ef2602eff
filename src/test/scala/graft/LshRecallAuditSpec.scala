package graft

import org.apache.spark.sql.functions._

/** q195's truth-set and miss-accounting semantics on crafted documents
  * whose exact 3-gram Jaccard is known by construction — including a
  * moderate-similarity pair (decile 6) where banding may or may not
  * propose the pair: the spec does not predict the banding outcome, it
  * asserts q195's caught column AGREES with the engine's own admitted
  * set, which is the query's whole claim.
  */
class LshRecallAuditSpec extends SparkSpec {
  import spark.implicits._

  test("truth deciles are exact; caught == membership in the admitted pair set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-recall-").toString
    val t = (1 to 20).map(i => s"t$i")
    val u = (17 to 20).map(i => s"u$i")
    Seq(
      (1L, t.mkString(" ")),                        // 18 distinct 3-grams
      (2L, t.mkString(" ")),                        // exact dup: J = 1.0 -> decile 10
      (3L, (t.take(16) ++ u).mkString(" ")),        // shares grams of t1..t16: inter 14, un 22 -> decile 6
      (4L, (1 to 20).map(i => s"z$i").mkString(" "))) // unrelated
      .map { case (id, txt) => (id, txt, "en", "s", txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q195_lsh_recall_audit")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // exact dup pair: decile 10, and banding MUST catch identical signatures
    assert(rows(10L) == (1L, 1L, 1000000L), s"dup pair: $rows")
    // moderate pairs (1,3) AND (2,3) — doc 2 is doc 1's twin, so both
    // overlap doc 3 identically: inter = 14 (grams fully inside
    // t1..t16), un = 18 + 18 - 14 = 22 -> (10*14) div 22 = 6;
    // J = 0.636 >= 1/2 so both ARE truth — whether banding catches
    // them is the engine's own admitted set, which q195 must mirror
    val (nTrue6, nCaught6, ppm6) = rows(6L)
    assert(nTrue6 == 2L, s"moderate pair truth: $rows")
    val admitted = operators.DedupQueries.portableScoredPairs(spark, dir)
      .filter(col("n_match") >= operators.DedupQueries.PortMatchMin)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectCaught = Seq((1L, 3L), (2L, 3L)).count(admitted.contains)
    assert(nCaught6 == expectCaught && ppm6 == 1000000L * expectCaught / 2,
      s"caught must mirror the admitted set ($admitted): $rows")
    // the unrelated doc contributes no truth pair in any decile
    assert(rows.values.map(_._1).sum == 3L, s"extra truth pairs: $rows")
  }
}
