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

  /** Glass inventory (ref: build_database.py:78 reading data/bar_data.csv,
    * headered comma CSV).
    */
  def barStock(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.barStockRaw)
      .option("header", "true")
      .csv(path)

  /** Budapest feed: comma CSV whose Hungarian header (",TS,ital,költség")
    * is discarded — header=true with a declared schema skips the line and
    * uses our names (ref: build_database.py:105-112, `header=0, names=`).
    * Timestamps are second-precision ISO.
    */
  def budapest(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.salesRaw)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)
      .withColumn("bar", lit("budapest"))

  /** London feed: headerless, tab-separated (ref:
    * build_database.py:120-127, `header=None, sep="\t"`).
    */
  def london(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.salesRaw)
      .option("header", "false")
      .option("sep", "\t")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)
      .withColumn("bar", lit("london"))

  /** New York feed: headered comma CSV with US date order at minute
    * precision — "MM-dd-yyyy HH:mm" (ref: build_database.py:135-142).
    */
  def newYork(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.salesRaw)
      .option("header", "true")
      .option("timestampFormat", "MM-dd-yyyy HH:mm")
      .csv(path)
      .withColumn("bar", lit("new york"))
}
