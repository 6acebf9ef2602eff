package graft

/** The minimal-movement property q206 exists for, pinned mechanically:
  * when a 9th shard joins an 8-shard HRW layout, every doc either stays
  * put or moves TO the new shard — survivors never reshuffle among
  * themselves — and the moved fraction is ~1/9, not ~8/9 (what q199's
  * rank-mod dealing would cost on reshard).
  */
class RendezvousSpec extends SparkSpec {

  test("reshard 8→9 moves only to the new shard, at ~1/9 rate") {
    val rows = SparkEntry.queries("q206_rendezvous_sharding")(
      spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val moved = rows.filter(_._3)
    assert(moved.nonEmpty, "fixture degenerate: nothing moved on reshard")
    val strays = moved.filter(_._2 != 8L)
    assert(strays.isEmpty,
      s"${strays.length} docs moved between SURVIVING shards — HRW's " +
        "minimal-movement guarantee is broken")
    val rate = moved.length.toDouble / rows.length
    assert(rate > 0.03 && rate < 0.25,
      f"moved fraction $rate%.3f is far from the expected 1/9")
    // unmoved docs keep their exact shard (stability, not just count)
    assert(rows.filter(!_._3).forall(r => r._1 == r._2))
    // both worlds use every shard (hash mixing sanity)
    assert(rows.map(_._1).distinct.length == 8)
    assert(rows.map(_._2).distinct.length == 9)
  }
}
