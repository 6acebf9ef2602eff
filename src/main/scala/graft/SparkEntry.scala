package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the operator suites; each QueryDef carries
  * its Spark implementation and (when SQL-expressible) the DuckDB oracle.
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] = {
    val defs =
      CoreQueries.defs ++ EventQueries.defs ++ TextQueries.defs ++
        DedupQueries.defs ++ SimilarityQueries.defs ++ PipelineQueries.defs ++
        MultimodalQueries.defs ++ ExtensionQueries.defs ++ TpchQueries.defs ++
        TpchFullQueries.defs ++ CurationQueries.defs ++ ModelPrepQueries.defs ++
        SqlSurfaceQueries.defs ++ UnigramQueries.defs
    // a duplicate name would silently drop a query from the driver
    // contract via toMap's last-wins
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(",")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the poc_analysis-shaped pipeline (scan → broadcast join → agg →
    * broadcast join → case). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q17.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.sql.map(q.name -> _)).toMap
}
