package graft

import org.apache.spark.sql.functions._

/** Kernel-level contract for [[graft.functions.VecCentroidD2]] — q149's
  * fused centroid distance. The query-level exactness is pinned by
  * DecimalOverflowSpec (BigInt reference through the real q149); this
  * spec exercises the kernel directly where query fixtures can't reach:
  * randomized agreement with BigInt math across sign/magnitude mixes,
  * the null-element skip (one missing qd row, not a poisoned result),
  * and the 10³⁸ decimal-overflow null.
  */
class VecCentroidD2Spec extends SparkSpec {
  import spark.implicits._

  private def run(q: Seq[java.lang.Long], s: Seq[Long], c: Seq[Long]) = {
    val df = Seq((q, s, c)).toDF("q", "s", "c")
    graft.functions.VecExpressions.registerOnce(spark)
    df.select(call_function("vec_centroid_d2",
      col("q"), col("s"), col("c")).cast("string").as("d2"))
      .collect().head.getString(0)
  }

  test("agrees with BigInt math on randomized sign/magnitude mixes") {
    val rnd = new scala.util.Random(13)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(8)
      val q = Seq.fill(n)(rnd.nextLong() % 2000000000L)
      val s = Seq.fill(n)(rnd.nextLong() % 4000000000L)
      val c = Seq.fill(n)(1L + rnd.nextInt(30000).toLong)
      val expected = (0 until n).map { i =>
        val t = BigInt(c(i)) * BigInt(q(i)) - BigInt(s(i))
        t * t
      }.sum
      val got = run(q.map(Long.box), s, c)
      assert(got == expected.toString, s"q=$q s=$s c=$c")
    }
  }

  test("null q element is skipped (a missing qd row), not poisoning") {
    // dims 1 and 3 contribute; dim 2 is a null quantized slot
    val got = run(Seq(Long.box(10L), null, Long.box(20L)),
      Seq(5L, 99L, 7L), Seq(2L, 99L, 2L))
    val expected = BigInt(2 * 10 - 5).pow(2) + BigInt(2 * 20 - 7).pow(2)
    assert(got == expected.toString)
  }

  test("a sum at or past 10^38 is the decimal-overflow null") {
    // t = 9e18 per dim; t² ≈ 8.1e37, two dims ≈ 1.62e38 > 10³⁸
    val t = 9000000000000000000L
    assert(run(Seq(Long.box(t), Long.box(t)), Seq(0L, 0L), Seq(1L, 1L)) == null)
    // one dim stays under the cap and must survive
    assert(run(Seq(Long.box(t)), Seq(0L), Seq(1L)) ==
      (BigInt(t) * BigInt(t)).toString)
  }

  test("stat arrays shorter than the vector null the row (impossible by construction, loud if not)") {
    assert(run(Seq(Long.box(1L), Long.box(2L)), Seq(0L), Seq(1L)) == null)
  }
}
