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
  * and arbitrary merge order all give the same result (tested). The hash
  * family is seeded MurmurHash3 (NOT the same family as the per-row
  * [[HashFunctions.minhashSignature]] — group signatures are only
  * comparable to group signatures).
  */
class MinHashAgg(k: Int) extends Aggregator[Seq[String], Array[Long], Seq[Long]] {

  private def hash(seed: Int, s: String): Long = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s, seed)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s, h1)
    (h1.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
  }

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingles: Seq[String]): Array[Long] = {
    if (shingles == null) return buf // null array row (e.g. null text) adds nothing
    var i = 0
    while (i < k) {
      var m = buf(i)
      shingles.foreach { s => val h = hash(i, s); if (h < m) m = h }
      buf(i) = m; i += 1
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
  /** Column form: minhash_set_agg(shingleArrayCol). */
  def column(k: Int): Column => Column = {
    val f = udaf(new MinHashAgg(k), ExpressionEncoder[Seq[String]]())
    (c: Column) => f(c)
  }
}
