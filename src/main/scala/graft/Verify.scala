package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also writes its OWN per-query status manifest (verify_status.json:
  * name → rows written / error message) next to the dumps, so an empty
  * or missing driver-side CORRECTNESS artifact is self-diagnosing — the
  * r13 round shipped `{}` with no way to tell engine-break from
  * harness-break without a full re-run (r13 verdict #3). Paired with
  * `tools/check_oracle.py --json`, any party can regenerate the
  * canonical driver-format artifact in one command
  * (`VerifyStatusSpec` pins both halves).
  */
object Verify {
  def run(spark: SparkSession, sfDir: String, outDir: String,
      only: Option[Set[String]]): Unit = {
    new java.io.File(outDir).mkdirs()
    val selected = only.fold(SparkEntry.queries)(ks =>
      SparkEntry.queries.filter { case (k, _) => ks(k) })
    val status = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // footer-metadata count of what actually landed on disk
        val n = spark.read.parquet(s"$outDir/$name").count()
        status(name) = s"""{"rows": $n, "err": null}"""
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        status(name) = s"""{"rows": null, "err": ${Json.q(String.valueOf(e.getMessage))}}"""
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Json.q(k)}: ${Json.q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/verify_status.json"),
      status.map { case (k, v) => s"${Json.q(k)}: $v" }.mkString("{", ",", "}"))
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.get()
    // optional name filter for iterating on single queries; the driver
    // never sets it, so default behavior is unchanged
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    run(spark, sfDir, outDir, only)
    spark.stop()
  }
}
