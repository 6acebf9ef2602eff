package graft

import graft.functions.{TopKBuffer, TopKNative}
import org.scalatest.funsuite.AnyFunSuite

class TopKNativeSpec extends AnyFunSuite {

  test("buffer keeps k best with ord-desc id-asc tiebreak; stays bounded") {
    val b = new TopKBuffer(3)
    Seq((5L, 2L), (9L, 1L), (5L, 1L), (1L, 9L), (9L, 2L)).foreach((b.add _).tupled)
    assert(b.result() == Seq((9L, 1L), (9L, 2L), (5L, 1L)))
    val big = new TopKBuffer(3)
    (1L to 10000L).foreach(i => big.add(i, i))
    assert(big.n <= 12)
    assert(big.result() == Seq((10000L, 10000L), (9999L, 9999L), (9998L, 9998L)))
  }

  test("merge is split-invariant and commutative") {
    val rows = (1L to 200L).map(i => (i % 23, i))
    def fold(rs: Seq[(Long, Long)]): TopKBuffer = {
      val b = new TopKBuffer(4); rs.foreach((b.add _).tupled); b
    }
    val whole = fold(rows).result()
    for (at <- Seq(1, 67, 199)) {
      val (x, y) = rows.splitAt(at)
      val m1 = fold(x); m1.mergeIn(fold(y))
      assert(m1.result() == whole, s"split $at")
      val m2 = fold(y); m2.mergeIn(fold(x))
      assert(m2.result() == whole, s"commuted split $at")
    }
  }

  test("serialize/deserialize round-trips through the exchange format") {
    val agg = TopKNative(null, null, 5)
    val b = new TopKBuffer(5)
    Seq((3L, 1L), (7L, 2L), (7L, 1L), (Long.MinValue, 9L)).foreach((b.add _).tupled)
    val rt = agg.deserialize(agg.serialize(b))
    assert(rt.result() == b.result())
    // Long.MinValue must rank LAST (the negation-overflow trap)
    assert(b.result().last == ((Long.MinValue, 9L)))
  }
}
