package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE's runtime skew handling, demonstrated end to end: a join with one
  * hot key must come out of adaptive execution with
  * `SortMergeJoin(isSkewJoin=true)` — the skewed partition split into
  * advisory-sized sub-partitions at runtime, no salting needed. This is
  * the third leg of the engine's skew story: q146 profiles skew, q75
  * salts the aggregations AQE can't split, and AQE itself covers skewed
  * JOINS — this spec pins that the third leg actually engages under the
  * session's config shape (it silently no-ops if, e.g., the join got
  * planned as broadcast or the thresholds are misordered).
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join (isSkewJoin=true)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-scale thresholds: skewed = partition > max(256KB, 2 × median);
      // split target 64KB. Defaults (256MB / 5×) are production-sized.
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      // force a sort-merge join — a broadcast join has no skew to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // fact: 200k rows on ONE key + a thin uniform tail; ~100-byte payload
      // makes the hot shuffle partition a few MB — far past the threshold
      val hot = spark.range(0, 200000)
        .select(lit(0L).as("k"), lpad(col("id").cast("string"), 100, "x").as("payload"))
      val tail = spark.range(0, 2000)
        .select((col("id") % 50 + 1).as("k"), lit("y").as("payload"))
      // NOTE: no keyed operator downstream of the join — splitting a
      // partition breaks the join output's hash-clustering, so AQE skips
      // the optimization when a groupBy/window still needs it (that case
      // is what q75-style salting is for)
      val dim = spark.range(0, 51).select(col("id").as("k"), (col("id") * 10).as("v"))
      val joined = hot.unionByName(tail).join(dim, "k")
      // execute THIS QueryExecution (df.count() would plan a separate
      // one, leaving joined's adaptive plan unexecuted and unmarked)
      assert(joined.queryExecution.toRdd.count() == 202000)

      // string-match the final adaptive plan: the SMJ sits inside a
      // ResultQueryStage, whose subtree a TreeNode.collect can't reach
      // (query stages are leaves to the outer tree)
      val finalPlan = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }).toString
      assert(finalPlan.contains("SortMergeJoin(skew=true)"),
        s"AQE did not mark the join skewed; plan:\n$finalPlan")
      assert(finalPlan.contains("AQEShuffleRead coalesced and skewed"),
        s"hot partition was not split into skew sub-reads; plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
