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
  *
  * The payload rides as ONE struct (null on left-side filler rows) and
  * `last(ignoreNulls)` skips only those fillers — a genuinely-NULL field
  * inside the newest right row is preserved, and all fields always come
  * from the SAME right row. Per-column last(ignoreNulls) would instead
  * skip genuine NULLs (returning a stale older value) and could tear
  * fields from different right rows.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, payloadCols: Seq[String]): DataFrame = {
    val payloadStruct = struct(payloadCols.map(col): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payloadCols.map(c => right.schema(c).copy())))
    val lTagged = left.select(
      col(key).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        (left.columns.toIndexedSeq.map(c => col(c)) :+ nullPayload.as("__p")): _*)
    val rTagged = right.select(
      col(key).as("__k") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        (left.columns.toIndexedSeq.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
          payloadStruct.as("__p")): _*)
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payloadCols.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Convenience for Column-expression key joins is intentionally absent:
    * as-of is a per-key ordered merge; composite keys should be packed
    * into one struct column by the caller (keeps the shuffle key narrow).
    */
}
