package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name   stable query id (sorted lexicographically in reports)
  * @param fn     Spark implementation; receives the scale-factor dir
  * @param sql    equivalent ANSI SQL for the DuckDB oracle over the same
  *               parquet tables, or None for ops not expressible in SQL
  *               (those get a weaker rows-only check from the driver).
  *
  * Column names of `fn`'s result and `sql`'s result must match exactly —
  * the driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

object QueryDef {
  def oracle(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
