package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All schemas are declared by the parquet footers; we read them as-is.
  * Filters/projections applied downstream reach the scan via Catalyst
  * pushdown (verify with `.explain("formatted")` → `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: INT64 TIMESTAMP(NANOS) (read as plain long via
    * legacy.parquet.nanosAsLong, since Spark 4 refuses nanos timestamps)
    * and INT64 TIMESTAMP_MICROS with isAdjustedToUTC=false (read as
    * TIMESTAMP_NTZ). Dispatch on the type the scan actually produced so
    * either generation loads; downstream always sees session-TZ
    * TimestampType (session TZ is UTC, so the NTZ cast is value-preserving
    * and matches DuckDB's naive TIMESTAMP reading).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, sfDir, "events"))
  }

  /** Normalize an events frame's `ts` to TimestampType whatever the scan
    * produced. Shared by the batch loader and the streaming specs (a file
    * stream over the same parquet hits the same encoding drift).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      // nanos-as-long: FLOOR division, not DIV (truncation) — a pre-epoch
      // nanos value must round toward -inf to match DuckDB's TIMESTAMP_NS
      // reading; integer math because doubles lose precision at 1e18.
      df.withColumn("ts", timestamp_micros(
        expr("(ts - ((ts % 1000 + 1000) % 1000)) DIV 1000")))
    case _: org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => df
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
