package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator folding per-row MinHash SIGNATURES into the
  * group-level signature by element-wise min — the union-set identity
  * min_grams(union) = min_rows(min_grams(row)) makes this exact, and
  * element-wise min is commutative/associative, so partials combine
  * map-side and merge in any order (signatures, never shingle sets,
  * cross the exchange — SURVEY.md §2.9's custom-UDAF slot).
  *
  * Family-agnostic on purpose: it consumes whatever per-row signature
  * column it is given. Fed the PORTABLE kernel
  * ([[HashFunctions.portableMinhashSigNative]], sentinel P for
  * gram-less rows — the sentinel is the fold's neutral element, so
  * such rows add nothing, and an all-gram-less group surfaces as the
  * all-sentinel signature for the caller to NULL out), the group
  * signature is bit-replayable by a DuckDB oracle — which is why this
  * superseded the round-6 Murmur-family shingle aggregator (that one
  * was engine-internal, hence rows-only, and re-hashed every shingle
  * k times inside the fold; this consumes the codegen'd scan-stage
  * signature instead).
  */
class MinSigAgg(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig == null) return buf // null signature row adds nothing
    var i = 0
    val n = math.min(k, sig.length)
    while (i < n) { val v = sig(i); if (v < buf(i)) buf(i) = v; i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object MinSigAgg {
  /** Column form: min_sig_agg(signatureArrayCol). */
  def column(k: Int): Column => Column = {
    val f = udaf(new MinSigAgg(k), ExpressionEncoder[Seq[Long]]())
    (c: Column) => f(c)
  }
}
