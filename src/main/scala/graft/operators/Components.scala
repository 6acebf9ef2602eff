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
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    var labels = vertices.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(col("src").as("id")).agg(min("component").as("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .localCheckpoint()
      changed = next.join(
          labels.withColumnRenamed("component", "prev"), Seq("id"))
        .filter(col("component") =!= col("prev")).count()
      labels = next
      iter += 1
    }
    labels
  }
}
