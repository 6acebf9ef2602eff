package graft
object TimeQ {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    a.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
