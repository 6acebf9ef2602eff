package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout tools: partition pruning and skew salting — with
  * [[Bucketing]], the three levers that keep plans healthy at 100 TB.
  */
object Layout {

  /** Hive-style partitioned write (e.g. by day / tenant): queries that
    * filter on the partition column read only matching directories —
    * the scan's PartitionFilters, the difference between reading one
    * partition and the whole table (SURVEY.md §4: the watermark filter
    * pushed into a partition-pruned layout).
    *
    * Rows are shuffled onto the partition key first: without it every
    * task opens a writer per partition value it sees (tasks x values
    * small files — the classic write blowup); with it, file count =
    * partition-value count.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(df.col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Lineitem partitioned by ship month — the shared fact-table layout
    * for the partition-pruning queries (q29 aggregates over a pruned
    * month range; q121 joins it against a runtime dimension). Stored as
    * an [[ArtifactStore.partitioned]] artifact: built once per
    * (catalog, sf-dir) and read back, so queries — and the bench — pay
    * the pruned READ only; the write path itself stays covered by
    * [[writePartitioned]]'s LayoutSpec. Month granularity is a layout
    * decision: a bounded directory count where day-level would mean
    * thousands of dirs for this date range.
    */
  def partitionedLineitem(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    ArtifactStore.partitioned(spark, sfDir, "li_part", Seq("ship_month")) {
      graft.Tables.lineitem(spark, sfDir)
        .withColumn("ship_month", trunc(col("l_shipdate"), "month"))
    }

  /** Two-phase salted aggregation for skew-heavy keys: phase 1 groups on
    * (key, salt) spreading one hot key over `salts` reducers; phase 2
    * merges the partials per key. Correct for algebraic aggregates
    * (sum/count/min/max — anything with a merge). AQE's skew handling
    * only splits JOIN partitions; a skewed groupBy still funnels one key
    * to one task without this.
    *
    * The salt MUST be a pure function of row content, never of
    * spark_partition_id/monotonically_increasing_id: on a fetch-failure
    * retry the stage recomputes rows in a different order, and an
    * order-dependent salt would route the recomputed copies to different
    * (key, salt) groups than the copies already consumed downstream —
    * rows double-counted or lost (the SPARK-23207 class of bug), exactly
    * in the retry-prone regime this helper exists for. Hashing the
    * spread columns is deterministic under recomputation; `saltCols`
    * should be columns that vary within the hot key (e.g. the value
    * column) so the hot key actually spreads.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column, salts: Int,
      saltCols: Seq[Column] = Seq.empty): DataFrame = {
    val spread = if (saltCols.nonEmpty) saltCols else Seq(valueCol)
    df.withColumn("__salt", pmod(xxhash64(spread: _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as("sum_value"), sum("__pcnt").as("n"))
  }

  /** Salted broadcast-side replication for a skewed join: explode the
    * small side `salts` times with a salt column, salt the big side the
    * same way, join on (key, salt). Spreads one hot key's rows over
    * `salts` tasks while every row still joins exactly once.
    * Deterministic for the same retry-safety reason as [[saltedSumCount]]:
    * the big side's salt hashes caller-chosen content columns.
    */
  def saltedJoinKeys(big: DataFrame, small: DataFrame, key: String, salts: Int,
      bigSaltCols: Seq[Column]): (DataFrame, DataFrame, Column) = {
    require(bigSaltCols.nonEmpty, "need content columns to derive a deterministic salt")
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(bigSaltCols: _*), lit(salts)).cast("int"))
    val smallSalted = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    (bigSalted, smallSalted,
      bigSalted(key) === smallSalted(key) && bigSalted("__salt") === smallSalted("__salt"))
  }
}
