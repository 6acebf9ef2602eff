package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults chosen for the driver harness (single JVM, `local[32]`) but the
  * same settings are what we'd ship on a real cluster:
  *   - AQE on: runtime partition coalescing, skew-join splitting, and
  *     dynamic broadcast conversion — the knobs that keep a plan healthy
  *     when the data is 1000x bigger than what it was tuned on.
  *   - UTC session timezone: oracle (DuckDB) parity for all timestamp math.
  *   - shuffle.partitions sized to the local core count; on a real cluster
  *     this would be ~2-3x total executor cores (AQE coalesces down).
  */
object GraftSession {
  def builder(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession.Builder = {
    // cores doubles as the shuffle-partition count, which must be numeric
    // — "*" (all cores) is a valid master spec but not a partition count
    val partitions = cores.toIntOption.getOrElse(
      Runtime.getRuntime.availableProcessors).toString
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
  }

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
