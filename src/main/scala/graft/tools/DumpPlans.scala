package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: dump `explain("formatted")` for a list of queries to files
  * (the judge-readable plan evidence for optimization rounds).
  * Usage: runMain graft.tools.DumpPlans <outDir> <suffix> <q1,q2,...> [sfDir]
  */
object DumpPlans {
  def main(a: Array[String]): Unit = {
    val outDir = Paths.get(a(0))
    Files.createDirectories(outDir)
    val suffix = a(1)
    val names = a(2).split(",").map(_.trim).filter(_.nonEmpty)
    val d = if (a.length > 3) a(3) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      val txt = df.queryExecution.explainString(FormattedMode)
      Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt)
      println(s"[plans] wrote ${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
