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

  test("q170's pair stage: AQE splits a mega-cluster of the c_id self-join") {
    // SCALE.md's SemDeDup skew claim, demonstrated instead of asserted:
    // q170's pair stage is a self-join of (c_id, vec_id, v) on c_id, so
    // a MEGA-CLUSTER (one c_id owning a large share of the corpus —
    // boilerplate/empty-ish embeddings collapse into one centroid in
    // practice) lands all its rows in one shuffle partition on BOTH
    // sides. The downstream n_close aggregation is keyed on ib, NOT on
    // the join key, so the join output's c_id-clustering is not needed
    // afterwards and AQE is free to split the hot partition. This pins
    // that the split actually engages on the pair-stage JOIN SHAPE
    // (same keying, array payload, ia<ib pruning, ib-keyed count).
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // mega-cluster: 3000 vectors in c_id 0 with a 128-dim mixed
      // payload (~1 KB/row raw → megabytes in the hot partition, well
      // past the 128 KB test threshold even after shuffle compression);
      // tail: 50 clusters × 40 vectors (the median)
      val hot = spark.range(0, 3000)
        .select(lit(0L).as("c_id"), col("id").as("vec_id"))
      val tail = spark.range(0, 2000)
        .select((col("id") % 50 + 1).as("c_id"), (col("id") + 10000).as("vec_id"))
      val m = hot.unionByName(tail)
        .withColumn("v", transform(sequence(lit(0), lit(127)),
          i => pmod(col("vec_id") * 2654435761L + i * 40503, lit(127)) - 63))
      // q170's actual pair-stage kernel: intDotNorms consumes BOTH
      // arrays, so the ~1 KB/row payload genuinely crosses the c_id
      // exchange (a payload nothing downstream reads would be
      // projection-pruned before the shuffle and never register as skew)
      val pairs = m.select(col("c_id"), col("vec_id").as("ia"), col("v").as("va"))
        .join(m.select(col("c_id"), col("vec_id").as("ib"), col("v").as("vb")), Seq("c_id"))
        .filter(col("ia") < col("ib"))
        .select(col("ib"),
          graft.functions.VecExpressions.intDotNorms(spark, col("va"), col("vb")).as("st"))
        .groupBy("ib").agg(count(lit(1)).as("n_pairs"), sum(col("st.dot")).as("dot_sum"))
      // every vec except each cluster's minimum has ≥1 ia<ib partner:
      // 5000 vectors − 51 cluster minima
      assert(pairs.queryExecution.toRdd.count() == 3000 + 2000 - 51)
      val finalPlan = (pairs.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }).toString
      assert(finalPlan.contains("SortMergeJoin(skew=true)"),
        s"AQE did not mark the pair-stage join skewed; plan:\n$finalPlan")
      assert(finalPlan.contains("skewed"),
        s"mega-cluster partition was not split; plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
