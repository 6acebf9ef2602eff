package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the transitive-closure step that turns pairwise near-dup hits into
  * dedup CLUSTERS (a ~ b, b ~ c ⇒ {a,b,c} share one keeper).
  *
  * Each round every vertex adopts the smallest label in its neighborhood;
  * rounds ≈ graph diameter (near-dup clusters are shallow — a handful).
  * The driver loop only orchestrates (count per round); all data work is
  * distributed joins partitioned on vertex id, and `localCheckpoint`
  * truncates the lineage so plan size stays O(1) per round instead of
  * growing with iterations. State per round is |V| (id, label) pairs +
  * |E| edges — never materialized on the driver.
  */
object Components {

  /** @param edges    undirected edge list, columns (src, dst), Long ids
    * @param vertices one column `id` — includes isolated vertices
    * @return (id, component) where component = min vertex id reachable
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIters: Int = 25): DataFrame = {
    // Symmetrized edges + a self-loop per vertex, persisted ONCE and
    // pre-partitioned on the probe key: the big (|E|-sized) side never
    // re-shuffles — each round only the small (id, label) table moves.
    // Self-loops make every vertex its own neighbor, so one join+groupBy
    // computes the next labeling outright (no left-join-back per round).
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .unionByName(vertices.select(col("id").as("src"), col("id").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // LAZY checkpoints throughout: the potential aggregation below is
    // the round's ONLY action — it materializes the checkpoint as a
    // side effect, so each round costs one Spark job, not two (eager
    // localCheckpoint ran a dedicated materialization job per round;
    // at small per-round data the loop was job-overhead-bound).
    var labels = vertices.select(col("id"), col("id").as("component"))
      .localCheckpoint(eager = false)
    // Labels only ever DECREASE (min is monotone), so the label sum is a
    // strictly decreasing potential function: fixpoint ⇔ sum unchanged.
    // One agg per round replaces a join + count. decimal(38,0) so huge
    // id spaces can't overflow-collide.
    def potential(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).first().getDecimal(0)
    var cur = potential(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val next = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(col("src").as("id")).agg(min("component").as("component"))
        .localCheckpoint(eager = false)
      val nextPot = potential(next)
      converged = nextPot.compareTo(cur) == 0
      cur = nextPot
      labels = next
      iter += 1
    }
    sym.unpersist(blocking = false)
    if (!converged)
      // truncated labels would silently split one true cluster into
      // several "keepers" — surface it loudly instead
      System.err.println(s"[graft] connectedComponents did NOT converge in " +
        s"$maxIters iterations — labels are an upper bound on the true " +
        s"components (clusters deeper than $maxIters hops are split); " +
        s"re-run with a larger maxIters")
    labels
  }
}
