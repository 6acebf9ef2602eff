package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational (JDBC) sink/source — the literal form of the reference's
  * SQLite landing step (ref: build_database.py:70-73,
  * `df.to_sql(name, con, if_exists=...)`), generalized to any JDBC
  * database through Spark's built-in JDBC data source.
  *
  * Mapping: `replace` is pandas' `if_exists='replace'` (drop +
  * recreate — the reference's dimension snapshots and poc_analysis);
  * `append` is `if_exists='append'` (the incremental global_sales
  * contract). Reads come back through predicate-pushing JDBC scans.
  *
  * Scale shape: each DataFrame partition opens one connection and
  * writes its rows in JDBC batches, so write parallelism = partition
  * count. `maxConnections` caps it — a 1000-partition fact must not
  * open 1000 connections against a single relational endpoint; the
  * coalesce is a narrow (no-shuffle) dependency.
  *
  * Tested against embedded Derby (JdbcSinkSpec) — the JDBC engine
  * available in this environment; SQLite parity is the semantics
  * mapping, not a bit-identical database file.
  */
object JdbcSink {

  /** Drop-and-recreate semantics (pandas if_exists='replace'). */
  def replace(df: DataFrame, url: String, table: String, driver: String,
      maxConnections: Int = 8): Unit =
    write(df, url, table, driver, "overwrite", maxConnections)

  /** Append semantics (pandas if_exists='append'). */
  def append(df: DataFrame, url: String, table: String, driver: String,
      maxConnections: Int = 8): Unit =
    write(df, url, table, driver, "append", maxConnections)

  private def write(df: DataFrame, url: String, table: String, driver: String,
      mode: String, maxConnections: Int): Unit =
    df.write.mode(mode)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      // the JDBC writer's own cap: coalesces (narrow) to at most this
      // many partitions before writing — one connection per partition
      .option("numPartitions", maxConnections.toString)
      .save()

  def read(spark: SparkSession, url: String, table: String, driver: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .load()
}
