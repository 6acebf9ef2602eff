package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items sketch as a typed `Aggregator`: the
  * distributed first pass of exact φ-heavy-hitters over an unbounded
  * token domain.
  *
  * With k counters, the sketch guarantees every item whose true
  * frequency exceeds N/(k+1) is present in the final candidate set —
  * the classic MG bound — and the merge rule below (sum counters, then
  * subtract the (k+1)-th largest count and drop non-positives) preserves
  * that bound under ARBITRARY merge trees, which is exactly what Spark's
  * partial aggregation does (Agarwal et al., "Mergeable Summaries",
  * PODS'12). So the map-side partials each carry ≤ k counters — the
  * exchange is O(partitions × k), independent of N and of vocabulary
  * size. A second exact counting pass restricted to the candidates turns
  * the superset into an exact answer (see q119).
  *
  * The alternative — a global `groupBy(token)` — has output (and
  * shuffle) proportional to the vocabulary, which for web-scale token
  * streams is itself huge; the sketch bounds pass-1 state at k no matter
  * the input.
  */
class MisraGriesAgg(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 0 && k <= (1 << 16), s"unreasonable k=$k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c)             => b.updated(tok, c + 1L)
      case None if b.size < k  => b.updated(tok, 1L)
      // all k counters taken: decrement every counter (the arriving
      // token's implicit counter cancels against them), dropping zeros
      case None => b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everything; ≤ k survive
      val cut = sum.valuesIterator.toArray.sortInPlaceWith(_ > _).apply(k)
      sum.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  /** Candidate tokens only — counts are estimates and deliberately NOT
    * exposed; the exact pass re-counts. Sorted for determinism. */
  override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object MisraGriesAgg {
  /** Column form: misra_gries(tok) → array<string> candidates. */
  def column(k: Int): Column => Column = {
    val f = udaf(new MisraGriesAgg(k), ExpressionEncoder[String]())
    (tok: Column) => f(tok)
  }
}
