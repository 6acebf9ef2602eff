package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate: keeps the k largest (ord, id) pairs per
  * group — ord descending, id ascending as the deterministic tiebreak.
  *
  * This is the scale-correct form of "top N per group": the window
  * formulation (`row_number` ≤ k) shuffles and sorts EVERY row of every
  * group, while this Aggregator partial-aggregates map-side — each
  * upstream partition contributes at most a k-bounded buffer per key to
  * the exchange, so the shuffle is O(groups × k), not O(rows). At 100 TB
  * that's the difference between shuffling terabytes and gigabytes.
  *
  * The buffer is a plain Seq trimmed lazily at 4k (amortized O(log k)
  * per row) — commutative and associative under merge (tested), so
  * partial aggregation and arbitrary merge order are safe.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0 && k <= (1 << 20), s"unreasonable k=$k")

  // explicit composite comparator — sortBy(-ord) would overflow on
  // ord = Long.MinValue and rank the smallest value first; a manual
  // compare avoids per-comparison key allocation in the sort hot path
  private val byOrdDescIdAsc: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private def ordered(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.sorted(byOrdDescIdAsc)

  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
    if (s.length > 4 * k) ordered(s).take(k) else s

  override def zero: Seq[(Long, Long)] = Nil
  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    trim(a +: b)
  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(a ++ b)
  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    ordered(b).take(k)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopKAgg {
  /** Column form: top_k_agg(ordCol, idCol) → array<struct<_1,_2>>. */
  def column(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKAgg(k), ExpressionEncoder[(Long, Long)]())
    (ord: Column, id: Column) => f(ord, id)
  }
}
