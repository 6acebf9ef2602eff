package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the shuffle-elimination tool for repeated
  * co-keyed joins/aggregations (SURVEY.md §7 phase 6: 100-TB layout).
  *
  * Writing both sides of a hot join bucketed+sorted by the join key
  * means every subsequent join is a zip of pre-partitioned, pre-sorted
  * buckets: no Exchange, no Sort in the plan. At 100 TB that converts
  * the nightly fact-fact join from a full-cluster shuffle into a
  * map-side merge. The bucket count is a layout decision: pick
  * ~(table size / target partition size), keep it a multiple across
  * tables that join together so Spark can zip them.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, warehouseDir: String): Unit =
    writeBucketed(df, table, Seq(key), numBuckets, warehouseDir)

  /** Composite-key form — bucketed AND sorted by `keys` so a join on
    * exactly `keys` reads the table with no Exchange (and, when each
    * bucket is a single file — repartition on the keys before calling —
    * no Sort either). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int, warehouseDir: String): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", s"$warehouseDir/$table")
      .saveAsTable(table)

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
