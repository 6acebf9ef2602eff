package graft

import org.apache.spark.sql.functions._

/** Structural invariants of q170 (SemDeDup) that the hash oracle can't
  * state directly: the keeper rule is well-founded and the output covers
  * the corpus exactly once.
  */
class SemanticDedupSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val rows = SparkEntry.queries("q170_semantic_dedup")(spark, d)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

  test("one row per corpus vector, keep ⟺ no closer-lower-id neighbor") {
    val nVecs = Tables.embeddings(spark, d).count()
    assert(rows.length.toLong == nVecs)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (id, _, nClose, keep) =>
      assert(keep == (nClose == 0), s"vec $id: keep=$keep but n_close=$nClose")
    }
  }

  test("the lowest vec_id of every cluster is always kept (well-founded keeper)") {
    // n_close counts LOWER-id partners only, so each cluster's min id has
    // none by construction — greedy keep-lowest can never empty a cluster
    rows.groupBy(_._2).foreach { case (cId, members) =>
      val minId = members.map(_._1).min
      val (_, _, _, keep) = members.find(_._1 == minId).get
      assert(keep, s"cluster $cId: min vec $minId was dropped")
    }
  }

  test("semantic dedup actually fires on this corpus (non-vacuous threshold)") {
    assert(rows.exists(!_._4), "no vector dropped — threshold never exercised")
    assert(rows.count(_._4) > rows.length / 2, "over half the corpus dropped")
  }

  test("q182 prototype selection: per-cluster quota is EXACTLY ceil(0.3·n), top-ranked prefix kept") {
    val out = SparkEntry.queries("q182_prototype_selection")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val nVecs = Tables.embeddings(spark, d).count()
    assert(out.length.toLong == nVecs, "selection must cover the corpus exactly once")
    assert(out.map(_._1).distinct.length == out.length)
    out.groupBy(_._2).foreach { case (c, ms) =>
      val n = ms.length
      val kept = ms.count(_._5)
      assert(kept == (3 * n + 9) / 10, s"cluster $c: kept $kept of $n ≠ ceil(0.3n)")
      // the kept rows are the rank prefix 1..kept — quota by prototypicality,
      // not an arbitrary subset
      assert(ms.filter(_._5).map(_._4).sorted.toSeq == (1L to kept).toSeq,
        s"cluster $c: kept ranks are not the top prefix")
    }
    // diversity property: every cluster retains at least one member
    assert(out.groupBy(_._2).forall(_._2.exists(_._5)))
  }
}
