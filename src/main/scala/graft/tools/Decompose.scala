package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: split a query's per-run wall time into (a) DataFrame
  * construction — any driver jobs the query fn itself runs (collects,
  * localCheckpoints, artifact builds) land here — (b) analysis +
  * optimization + physical planning, and (c) execution (toRdd.count).
  * Usage: runMain graft.tools.Decompose <q1> [q2 ...]   (3 reps each)
  */
object Decompose {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    a.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, d).queryExecution.toRdd.count() // warm-up
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, d)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.executedPlan // force analysis + optimization + planning
        val t2 = System.nanoTime()
        qe.toRdd.count()
        val t3 = System.nanoTime()
        println(f"DECOMP $name%-28s rep$i construct=${(t1 - t0) / 1e9}%.3f " +
          f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
