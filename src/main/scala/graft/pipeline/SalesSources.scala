package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the three heterogeneous per-city sales feeds and the
  * glass-stock CSV (SURVEY.md §2.1 S1-S4). Each reader declares its
  * schema; per-source quirks (separator, header, timestamp format) are
  * encoded here and nowhere else.
  *
  * Scale note: gzip is not splittable — one .csv.gz = one task. For the
  * 100-TB layout the feeds land as many files per day (or zstd/bzip2),
  * so the scan parallelizes by file; nothing in this reader changes.
  */
object SalesSources {

  /** The SINGLE encoding of per-city CSV quirks, consumed by both the
    * batch readers below and the streaming readers
    * ([[graft.streaming.SalesStream.feed]]) — a fix to one feed's
    * separator/header/timestamp format reaches both paths, which is what
    * keeps the streamed poc_analysis parseably identical to batch.
    *
    *  - budapest: comma CSV whose Hungarian header (",TS,ital,költség")
    *    is discarded — header=true with a declared schema skips the line
    *    and uses our names (ref: build_database.py:105-112); ISO seconds.
    *  - london: headerless, tab-separated (ref: build_database.py:120-127).
    *  - new york: headered comma CSV, US date order at minute precision
    *    (ref: build_database.py:135-142).
    */
  val cityOptions: Map[String, Map[String, String]] = Map(
    "budapest" -> Map(
      "header" -> "true", "timestampFormat" -> "yyyy-MM-dd HH:mm:ss"),
    "london" -> Map(
      "header" -> "false", "sep" -> "\t",
      "timestampFormat" -> "yyyy-MM-dd HH:mm:ss"),
    "new york" -> Map(
      "header" -> "true", "timestampFormat" -> "MM-dd-yyyy HH:mm"))

  /** Glass inventory (ref: build_database.py:78 reading data/bar_data.csv,
    * headered comma CSV).
    */
  def barStock(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.barStockRaw)
      .option("header", "true")
      .csv(path)

  private def feed(spark: SparkSession, path: String, city: String): DataFrame =
    spark.read.schema(Schemas.salesRaw)
      .options(cityOptions(city))
      .csv(path)
      .withColumn("bar", lit(city))

  def budapest(spark: SparkSession, path: String): DataFrame =
    feed(spark, path, "budapest")

  def london(spark: SparkSession, path: String): DataFrame =
    feed(spark, path, "london")

  def newYork(spark: SparkSession, path: String): DataFrame =
    feed(spark, path, "new york")
}
