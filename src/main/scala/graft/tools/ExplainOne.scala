package graft.tools

/** Dev helper: print the formatted plan of one registered query.
  * Usage: runMain graft.tools.ExplainOne <queryName> [sfDir]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    if (args.isEmpty || !names.contains(args(0))) {
      System.err.println(s"usage: ExplainOne <queryName> [sfDir]\nqueries: ${names.mkString(" ")}")
      sys.exit(2)
    }
    val s = graft.GraftSession.get()
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries(args(0))(s, d)
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    s.stop()
  }
}
