package graft

import org.apache.spark.sql.functions._

/** q197's integer power iteration against an independent double-precision
  * reference: collect the sf0.001 embeddings, run the SAME number of
  * classical power-iteration rounds on the exact second-moment matrix in
  * doubles, and demand the integer-scaled trajectory points the same way
  * (|cos| ≥ 0.999 — the 1e-6-relative truncation of the s' div 10⁶ step
  * must not bend the direction) and strictly improves the Rayleigh
  * quotient over the start direction. Eigenvector CONVERGENCE is
  * deliberately not asserted: this corpus's spectrum is nearly flat
  * (λ1/λ2 ≈ 1.07), so no small fixed round count converges — the spec
  * pins that the integer arithmetic tracks the real linear algebra,
  * and the oracle hash-match pins that both engines replay it exactly.
  */
class PowerIterationSpec extends SparkSpec {

  test("integer rounds track the double-precision trajectory and improve the Rayleigh quotient") {
    val d = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, d)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val dims = vecs.head.length
    // exact second-moment matrix in doubles
    val c = Array.ofDim[Double](dims, dims)
    vecs.foreach { v =>
      var i = 0
      while (i < dims) {
        var j = 0
        while (j < dims) { c(i)(j) += v(i) * v(j); j += 1 }
        i += 1
      }
    }
    def matVec(m: Array[Array[Double]], x: Array[Double]): Array[Double] =
      m.map(row => row.zip(x).map { case (a, b) => a * b }.sum)
    def norm(x: Array[Double]): Double = math.sqrt(x.map(a => a * a).sum)
    var ref = Array.tabulate(dims)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to operators.SimilarityQueries.PowIters) {
      val w = matVec(c, ref)
      val n = norm(w)
      ref = w.map(_ / n)
    }

    val out = SparkEntry.queries("q197_power_iteration")(spark, d)
      .collect().map(r => r.getInt(0) -> r.getLong(2).toDouble).toMap
    val got = Array.tabulate(dims)(i => out(i))
    val cos = got.zip(ref).map { case (a, b) => a * b }.sum / (norm(got) * norm(ref))
    assert(cos >= 0.999,
      s"integer trajectory diverged from the double-precision rounds: cos=$cos")

    // and it genuinely dominates the start direction: Rayleigh quotient
    // of the result far exceeds e0's
    def rayleigh(x: Array[Double]): Double = {
      val w = matVec(c, x)
      x.zip(w).map { case (a, b) => a * b }.sum / x.zip(x).map { case (a, b) => a * b }.sum
    }
    val e0 = Array.tabulate(dims)(i => if (i == 0) 1.0 else 0.0)
    assert(rayleigh(got) > rayleigh(e0),
      "returned direction does not dominate the start direction")
  }
}
