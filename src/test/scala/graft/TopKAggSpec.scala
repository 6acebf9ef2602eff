package graft

import graft.functions.TopKAgg
import org.scalatest.funsuite.AnyFunSuite

class TopKAggSpec extends AnyFunSuite {

  private val agg = new TopKAgg(3)

  test("finish returns k largest by ord desc with id-asc tiebreak") {
    val rows = Seq((5L, 2L), (9L, 1L), (5L, 1L), (1L, 9L), (9L, 2L))
    val out = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    assert(out == Seq((9L, 1L), (9L, 2L), (5L, 1L)))
  }

  test("merge is split-invariant (map-side combine safety)") {
    val rows = (1L to 100L).map(i => (i % 17, i))
    val whole = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    for (splitAt <- Seq(1, 13, 50, 99)) {
      val (a, b) = rows.splitAt(splitAt)
      val merged = agg.finish(agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)))
      assert(merged == whole, s"split at $splitAt diverged")
      val swapped = agg.finish(agg.merge(
        b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce)))
      assert(swapped == whole, s"commuted split at $splitAt diverged")
    }
  }

  test("buffer stays bounded under long streams") {
    val big = (1L to 10000L).map(i => (i, i))
    val buf = big.foldLeft(agg.zero)(agg.reduce)
    assert(buf.length <= 12) // 4k with k=3
    assert(agg.finish(buf) == Seq((10000L, 10000L), (9999L, 9999L), (9998L, 9998L)))
  }
}
