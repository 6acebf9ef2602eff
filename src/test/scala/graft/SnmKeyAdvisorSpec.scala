package graft

/** q371's blocking-trade monotonicity on the sf0.001 corpus — the
  * structural facts any prefix-blocking advisor must satisfy, pinned
  * mechanically: refining the blocking key (w 8 → 16 → 24) can only
  * SPLIT blocks, so block count is non-decreasing, within-block pair
  * mass is non-increasing, and recall against the portable-MinHash
  * candidate truth is non-increasing (prefix-24 equality implies
  * prefix-16 implies prefix-8); the pair denominator is the same pair
  * table at every w.
  */
class SnmKeyAdvisorSpec extends SparkSpec {

  test("w refinement: blocks up, pair mass down, recall down, same pairs") {
    val rows = SparkEntry.queries("q371_snm_key_advisor")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), BigInt(r.getString(3)), r.getLong(4),
          r.getLong(5))))
      .toMap // w -> (n_blocks, max_block, cand_pairs_x2, n_pairs, n_same)
    assert(rows.keySet == Set(8L, 16L, 24L))
    val Seq(a, b, c) = Seq(8L, 16L, 24L).map(rows)
    assert(a._1 <= b._1 && b._1 <= c._1, "block count must not decrease")
    assert(a._3 >= b._3 && b._3 >= c._3, "pair mass must not increase")
    assert(a._5 >= b._5 && b._5 >= c._5, "recall must not increase")
    assert(a._4 == b._4 && b._4 == c._4, "same candidate-pair denominator")
    assert(a._4 > 0, "fixture must produce candidate pairs")
  }
}
