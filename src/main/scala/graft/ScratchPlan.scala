package graft
/** Dev tool: dump one query's formatted physical plan to a file —
  * `runMain graft.ScratchPlan <queryName> <outFile> [sfDir]` — for
  * iterating on plan shape outside the PlanCheck assertions. */
object ScratchPlan {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = if (a.length > 2) a(2) else "/root/testdata/sf0.01"
    val p = SparkEntry.queries(a(0))(spark, d)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(a(1)), p)
    spark.stop()
  }
}
