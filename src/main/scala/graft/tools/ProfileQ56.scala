package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.DedupQueries
import org.apache.spark.sql.functions._

/** Dev tool: per-round wall-time breakdown of q56's component loop. */
object ProfileQ56 {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = if (a.nonEmpty) a(0) else "/root/testdata/sf0.1"
    def ms(t0: Long) = (System.nanoTime - t0) / 1e6
    for (run <- 1 to 3) {
      var t0 = System.nanoTime
      val edges = DedupQueries.portableScoredPairs(spark, d)
        .filter(col("n_match") >= 2)
        .select(col("ia").as("src"), col("ib").as("dst"))
      val vertices = Tables.documents(spark, d).select(col("doc_id").as("id"))
      val sym = edges.select(col("src"), col("dst"))
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
        .unionByName(vertices.select(col("id").as("src"), col("id").as("dst")))
        .distinct()
        .repartition(col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(f"run $run: setup-build ${ms(t0)}%.0f ms")
      t0 = System.nanoTime
      var labels = vertices.select(col("id"), col("id").as("component")).localCheckpoint(false)
      println(f"run $run: labels0-build ${ms(t0)}%.0f ms")
      def potential(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
        df.agg(sum(col("component").cast("decimal(38,0)"))).first().getDecimal(0)
      t0 = System.nanoTime
      var cur = potential(labels)
      println(f"run $run: potential0 ${ms(t0)}%.0f ms")
      var iter = 0; var converged = false
      while (!converged && iter < 25) {
        t0 = System.nanoTime
        val next = sym.join(labels, sym("dst") === labels("id"))
          .groupBy(col("src").as("id")).agg(min("component").as("component"))
          .localCheckpoint(false) // lazy, matching Components.connectedComponents
        val tJoin = ms(t0)
        t0 = System.nanoTime
        val nextPot = potential(next)
        println(f"run $run round $iter: plan-build $tJoin%.0f ms, round-job(ckpt+potential) ${ms(t0)}%.0f ms")
        converged = nextPot.compareTo(cur) == 0
        cur = nextPot; labels = next; iter += 1
      }
      t0 = System.nanoTime
      labels.queryExecution.toRdd.count()
      println(f"run $run: final-count ${ms(t0)}%.0f ms, rounds=$iter")
      sym.unpersist(blocking = false)
    }
    spark.stop()
  }
}
