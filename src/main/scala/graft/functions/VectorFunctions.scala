package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns, built
  * entirely from Spark higher-order functions so everything stays inside
  * whole-stage codegen (no UDF serialization, no Python).
  *
  * At 100 TB these run per-row in the scan stage; the only shuffles are
  * whatever the caller adds (e.g. a top-k window).
  */
object VectorFunctions {

  /** Elementwise product then sum: dot(a, b). Widens to double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2NormSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  def l2Norm(a: Column): Column = sqrt(l2NormSq(a))

  /** Cosine similarity; null when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0))

  def nullif(c: Column, v: Column): Column = when(c === v, lit(null)).otherwise(c)

  /** Squared euclidean distance. */
  def l2DistSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Sign-random-projection bucket over the first `m` dims: an m-bit int
    * where bit i = (v(i) >= 0). Cheap LSH family for cosine similarity —
    * used to block ANN candidate generation so the join shuffles on a
    * small bucket key instead of cross-joining the full table.
    */
  def signBucket(a: Column, m: Int): Column =
    aggregate(slice(a, 1, m), lit(0L),
      (acc, v) => acc * 2 + when(v >= 0, lit(1L)).otherwise(lit(0L)))
}
