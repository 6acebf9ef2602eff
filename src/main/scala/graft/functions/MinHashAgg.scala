package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator producing a GROUP-level MinHash signature from each
  * row's shingle array: the signature of the union of all group members'
  * shingle sets (SURVEY.md §2.9 — the custom-UDAF/TypedImperativeAggregate
  * slot; set-similarity BETWEEN groups, e.g. near-duplicate languages,
  * topics, or whole partitions, without materializing the union).
  *
  * The buffer is the k-vector of running minima — commutative and
  * associative under element-wise min, so partial aggregation map-side
  * and arbitrary merge order all give the same result (tested).
  *
  * Hashing uses the same Kirsch–Mitzenmacher two-hash + splitmix64
  * scheme as [[TextHashKernels.minhashSig]]: per shingle, two 64-bit
  * base hashes (built from chained MurmurHash3 passes), then the i-th
  * "permutation" is mix64(h1 + i*h2) — O(1) string hashes + k integer
  * mixes per shingle instead of the previous O(k) string hashes. The
  * finalizer keeps the slots pseudo-independent (without it the slope
  * i*h2 dominates and slots correlate; see TextHashKernels doc). The
  * family is still Murmur-based, NOT byte-identical to the per-row
  * [[HashFunctions.minhashSignature]] — group signatures are only
  * comparable to group signatures.
  */
class MinHashAgg(k: Int) extends Aggregator[Seq[String], Array[Long], Seq[Long]] {
  import MinHashAgg.mix64

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingles: Seq[String]): Array[Long] = {
    if (shingles == null) return buf // null array row (e.g. null text) adds nothing
    shingles.foreach { s =>
      val a = scala.util.hashing.MurmurHash3.stringHash(s, 42)
      val b = scala.util.hashing.MurmurHash3.stringHash(s, a)
      val c = scala.util.hashing.MurmurHash3.stringHash(s, b)
      val e = scala.util.hashing.MurmurHash3.stringHash(s, c)
      val h1 = (a.toLong << 32) | (b.toLong & 0xFFFFFFFFL)
      val h2 = (c.toLong << 32) | (e.toLong & 0xFFFFFFFFL)
      var h = h1
      var j = 0
      while (j < k) {
        val v = mix64(h)
        if (v < buf(j)) buf(j) = v
        h += h2
        j += 1
      }
    }
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

object MinHashAgg {
  /** splitmix64 finalizer (same constants as TextHashKernels.mix64). */
  @inline private[functions] def mix64(v: Long): Long = {
    var z = v
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Column form: minhash_set_agg(shingleArrayCol). */
  def column(k: Int): Column => Column = {
    val f = udaf(new MinHashAgg(k), ExpressionEncoder[Seq[String]]())
    (c: Column) => f(c)
  }
}
