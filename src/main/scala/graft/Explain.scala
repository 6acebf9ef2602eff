package graft

/** Dev tool: print a query's formatted physical plan (pre-AQE) plus the
  * class tree, for auditing plan shapes beyond what FormattedMode text
  * shows (bucketed scans, exchange placement under specific joins).
  * Usage: runMain graft.Explain <queryName> [sfDir]
  */
object Explain {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = if (a.length > 1) a(1) else "/root/testdata/sf0.01"
    val df = SparkEntry.queries(a(0))(spark, d)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println("=== sparkPlan tree (class names) ===")
    def walk(p: org.apache.spark.sql.execution.SparkPlan, ind: Int): Unit = {
      val extra = p match {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          s" bucketSpec=${sc.relation.bucketSpec.isDefined} out=${sc.outputPartitioning}"
        case _ => ""
      }
      println("  " * ind + p.getClass.getSimpleName + extra)
      p.children.foreach(walk(_, ind + 1))
    }
    walk(df.queryExecution.sparkPlan, 0)
    spark.stop()
  }
}
