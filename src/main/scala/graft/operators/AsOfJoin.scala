package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark lacks natively (SURVEY.md
  * §2.9 scope boundary; the composition route (a) of the custom-operator
  * preference order).
  *
  * For each left row, attach the newest right row with the same key and
  * `rightTs <= leftTs`. Implemented WITHOUT a range cross-join:
  *
  *   union(left-tagged, right-tagged)
  *     → single shuffle on key
  *     → last_value(right payload) IGNORE NULLS over (key ORDER BY ts,
  *       side) rows-unbounded-preceding..current
  *     → keep left rows
  *
  * Cost is one shuffle + one sort of |L|+|R| — the same plan shape as a
  * window aggregate, so it scales like any groupBy; a naive
  * range-condition join would explode to |L|x|R| per key and is the
  * classic 100-TB trap. Right side sorts before left on ts ties (side
  * tag 0 < 1), so an exactly-equal timestamp matches, like DuckDB's
  * ASOF JOIN >= semantics.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, payloadCols: Seq[String]): DataFrame = {
    val lTagged = left.select(
      col(key).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        (left.columns.map(c => col(c)) ++
          payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val rTagged = right.select(
      col(key).as("__k") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        (left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payloadCols.map(col)): _*)
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .select(col("*") +: payloadCols.map(c =>
        last(col(c), ignoreNulls = true).over(w).as(s"__asof_$c")): _*)
    filled.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"__asof_$c").as(c)): _*)
  }

  /** Convenience for Column-expression key joins is intentionally absent:
    * as-of is a per-key ordered merge; composite keys should be packed
    * into one struct column by the caller (keeps the shuffle key narrow).
    */
}
