package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Row-level cleaning operators (SURVEY.md §2.2). All scalar, all
  * codegen'd — they run in the scan stage at any scale.
  */
object Clean {

  /** Digits-only extract with null on no-match, then cast — the dirty
    * "34 glasses" → 34 cleaner (ref: build_database.py:86-87). The
    * null-guard matters under Spark 4 ANSI mode, where casting '' throws.
    */
  def extractInt(c: Column): Column = {
    val digits = regexp_extract(c, "(\\d+)", 1)
    when(digits === "", lit(null)).otherwise(digits).cast("int")
  }

  /** Lowercase every string column — the reference applies this to every
    * table before load and both join keys depend on it (ref:
    * build_database.py:88-90,168,220-222; SURVEY.md §1.2).
    */
  def lowercaseStrings(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == StringType) d.withColumn(f.name, lower(col(f.name))) else d
    }

  /** Deterministic 0-based surrogate keys in `sortCols` order — the
    * oracle-stable form of pandas reset_index (ref:
    * build_database.py:82-85,165-166; SURVEY.md §2.2 P4).
    *
    * Scale note: row_number over an empty partitionBy is a single-task
    * window — fine for dimensions, wrong for a 100-TB fact. For facts use
    * [[contiguousId]], which numbers within partitions and offsets by
    * per-partition counts (one tiny count job, no global sort).
    */
  def orderedId(df: DataFrame, name: String, sortCols: Seq[Column]): DataFrame =
    df.withColumn(name, row_number().over(Window.orderBy(sortCols: _*)).cast("long") - 1)

  /** Contiguous unique 0-based ids without a global sort: zipWithIndex on
    * the underlying RDD (per-partition counts + offsets under the hood).
    * Ids depend on partitioning, so they are unique+contiguous but not
    * tied to a column order — the documented relaxation for fact-scale
    * keys (SURVEY.md §7 risk register).
    */
  def contiguousId(df: DataFrame, name: String): DataFrame = {
    val spark = df.sparkSession
    val withId = df.rdd.zipWithIndex.map { case (row, id) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ id)
    }
    spark.createDataFrame(withId,
      df.schema.add(name, org.apache.spark.sql.types.LongType, nullable = false))
  }

  /** Keep-newest-per-key dedup — deterministic window formulation of the
    * reference's sort-desc + drop_duplicates-keep-first (ref:
    * build_database.py:207-219; SURVEY.md §2.3 A4). Ties and null
    * timestamps break toward the larger tiebreaker column, nulls last,
    * so re-runs are bit-stable.
    */
  def keepNewest(df: DataFrame, keys: Seq[String], ts: String, tiebreak: String): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col(ts).desc_nulls_last, col(tiebreak).desc)))
      .filter(col("__rn") === 1)
      .drop("__rn")
}
