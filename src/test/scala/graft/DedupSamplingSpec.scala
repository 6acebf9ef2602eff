package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of q155's dedup-aware sampling — properties the
  * hash-match alone doesn't state:
  *  - singleton clusters are ALWAYS kept (u16 · 1 < 65536 for every
  *    16-bit u16): unique content never gets dropped by the sampler;
  *  - weights are exactly 1/cluster_size and sum to ~|clusters|: the
  *    weighted corpus counts every cluster once regardless of how many
  *    copies were crawled;
  *  - the keep decision is a pure function of (doc_id, cluster_size) —
  *    re-running yields the identical kept set.
  */
class DedupSamplingSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val rows =
    SparkEntry.queries("q155_dedup_sampling_weights")(spark, d)
      .select("doc_id", "cluster_id", "cluster_size", "weight", "kept")
      .collect()

  test("singleton clusters are always kept") {
    val singles = rows.filter(_.getAs[Long]("cluster_size") == 1L)
    assert(singles.nonEmpty, "corpus should contain unique docs")
    assert(singles.forall(_.getAs[Boolean]("kept")))
  }

  test("weights are 1/cluster_size and the weighted corpus counts each cluster once") {
    assert(rows.forall { r =>
      math.abs(r.getAs[Double]("weight") -
        1.0 / r.getAs[Long]("cluster_size")) < 1e-6
    })
    val weightSum = rows.map(_.getAs[Double]("weight")).sum
    val nClusters = rows.map(_.getAs[Long]("cluster_id")).distinct.length
    // Σ weight = Σ_clusters (size · 1/size) = |clusters| exactly (up to
    // the 1e-6 rounding q155 applies per row)
    assert(math.abs(weightSum - nClusters) < 1e-3,
      s"weighted corpus $weightSum should count each of $nClusters clusters once")
  }

  test("the kept set is deterministic across invocations") {
    val again = SparkEntry.queries("q155_dedup_sampling_weights")(spark, d)
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    val first = rows.filter(_.getAs[Boolean]("kept")).map(_.getAs[Long]("doc_id")).toSet
    assert(again == first)
  }
}
