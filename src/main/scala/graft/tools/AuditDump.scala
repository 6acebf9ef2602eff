package graft.tools

import graft.{GraftSession, PlanAudit, SparkEntry}

/** Dev tool: for each named query, print every broadcast build-side
  * subtree that the corpus-broadcast audit flags as unbounded. */
object AuditDump {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = if (a.length > 1) a(1) else "/root/testdata/sf0.01"
    for (n <- a(0).split(",")) {
      println(s"===== $n =====")
      val p = SparkEntry.queries(n)(spark, d).queryExecution.optimizedPlan
      PlanAudit.unboundedCorpusBroadcasts(p).foreach { b =>
        println(b.treeString.linesIterator.take(12).mkString("\n"))
        println("-----")
      }
    }
    spark.stop()
  }
}
