package graft.tools
object DebugPlan {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    a.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, d)
      println(s"===== $name =====")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
