package graft

import graft.operators.SimilarityQueries
import org.apache.spark.sql.functions._

/** Structural invariants of the k-center coreset (q222) and the
  * hard-negative miner (q228) on real sf0.001 data — the properties
  * the algorithms guarantee, checked independently of the oracle:
  * Gonzalez's picked distances are non-increasing and bound the final
  * covering radius; a mined negative always carries a different label
  * and is the cell's true argmin.
  */
class CoresetHardNegSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q222: picked distances are non-increasing; covering radius <= last pick") {
    val rows = SimilarityQueries.q222.fn(spark, d)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1)
    assert(rows.length == SimilarityQueries.SelR + 1)
    assert(rows.head._3.isEmpty, "round 0 has no pick distance")
    assert(rows.last._2.isEmpty, "the radius row carries no vec_id")
    val picks = rows.slice(1, SimilarityQueries.SelR).flatMap(_._3)
    assert(picks.zip(picks.tail).forall { case (a, b) => a >= b },
      s"farthest-point distances must not increase: ${picks.toSeq}")
    val radius = rows.last._3.get
    assert(radius <= picks.last,
      s"covering radius $radius exceeds the last pick ${picks.last}")
    val ids = rows.slice(0, SimilarityQueries.SelR).flatMap(_._2)
    assert(ids.distinct.length == ids.length, "centers must be distinct")
  }

  test("q228: negatives differ in label, d2 > 0, and are the cell argmin") {
    val out = SimilarityQueries.q228.fn(spark, d).localCheckpoint(false)
    val bad = out.filter(col("neg_id").isNotNull &&
      (col("label") === col("neg_label") || col("d2") < 0)).count()
    assert(bad == 0L)
    // independent argmin recount for a sample vector with a negative
    val row = out.filter(col("neg_id").isNotNull).orderBy("vec_id").limit(1)
      .collect().head
    val (vid, cid, negId, d2) =
      (row.getLong(0), row.getLong(2), row.getLong(3), row.getLong(5))
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * 10000).cast("long")).as("v"))
    val mine = vecs.filter(col("vec_id") === vid).select("v", "label")
      .collect().head
    val (myV, myLab) = (mine.getSeq[Long](0).toArray, mine.getInt(1))
    // candidates = every different-label vector in the same IVF cell
    val cellIds = SimilarityQueries.q228.fn(spark, d)
      .filter(col("c_id") === cid).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val cands = vecs.collect()
      .filter(r => cellIds(r.getLong(0)) && r.getInt(1) != myLab &&
        r.getLong(0) != vid)
      .map { r =>
        val v = r.getSeq[Long](2).toArray
        val dd = v.indices.map(i => (myV(i) - v(i)) * (myV(i) - v(i))).sum
        (dd, r.getLong(0))
      }
    assert(cands.nonEmpty)
    val best = cands.min
    assert(best == ((d2, negId)),
      s"argmin recount $best != mined ($d2, $negId) for vec $vid")
  }
}
