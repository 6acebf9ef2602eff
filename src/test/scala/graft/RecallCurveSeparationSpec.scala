package graft

/** Pure-math pins for the two round-13 audit kernels:
  *
  *  - q309's OFF-DIAGONAL moment identity: the mean squared distance of
  *    cluster i's members to cluster j's mean expands as
  *    (n_j²·Σ‖x‖²_i − 2·n_j·(S_i·S_j) + n_i·‖S_j‖²) / (n_i·n_j²) — checked
  *    against the naive per-vector computation over exact rationals
  *    (BigInt numerators on the common n_j² denominator).
  *  - q307's running-count trick: with probe lists NESTED in the budget,
  *    a candidate is in the budget-b top-10 iff pr ≤ b and the count of
  *    pr≤b candidates at-or-before it (cos desc, id tiebreak) is ≤ 10 —
  *    checked against independently re-ranking the pr≤b sublist per
  *    budget.
  */
class RecallCurveSeparationSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val rnd = new scala.util.Random(0xC0FFEE)

  test("off-diagonal moment identity equals the naive mean squared distance") {
    for (_ <- 1 to 50) {
      val dims = 1 + rnd.nextInt(6)
      def cluster() = Seq.fill(1 + rnd.nextInt(7))(
        Vector.fill(dims)(BigInt(rnd.nextInt(2001) - 1000)))
      val ci = cluster(); val cj = cluster()
      val ni = BigInt(ci.size); val nj = BigInt(cj.size)
      val si = ci.transpose.map(_.sum); val sj = cj.transpose.map(_.sum)
      val ssqI = ci.map(v => v.map(x => x * x).sum).sum
      val dotIJ = si.zip(sj).map { case (a, b) => a * b }.sum
      val s2J = sj.map(x => x * x).sum
      val identityNum = nj * nj * ssqI - 2 * nj * dotIJ + ni * s2J
      // naive: Σ_i ‖n_j·x − S_j‖² has denominator n_j²; mean divides by n_i
      val naiveNum = ci.map { v =>
        v.zip(sj).map { case (x, s) => val d = nj * x - s; d * d }.sum
      }.sum
      assert(identityNum == naiveNum,
        s"moment identity diverged: $identityNum vs $naiveNum")
      assert(identityNum >= 0)
    }
  }

  test("running-count budget ranks equal per-budget re-ranking") {
    val budgets = Seq(1, 2, 4, 8, 16, 24, 32)
    for (_ <- 1 to 30) {
      // candidates for one query: (id, cos, pr) with pr in 1..32
      val cand = (0 until 200).map { id =>
        (id.toLong, rnd.nextInt(1000) / 1000.0, 1 + rnd.nextInt(32))
      }
      val sorted = cand.sortBy { case (id, cos, _) => (-cos, id) }
      for (b <- budgets) {
        // the q307 flag: pr<=b and running count of pr<=b rows <= 10
        var cnt = 0
        val viaCounts = sorted.flatMap { case (id, _, pr) =>
          if (pr <= b) { cnt += 1; if (cnt <= 10) Some(id) else None }
          else None
        }.toSet
        val direct = sorted.filter(_._3 <= b).take(10).map(_._1).toSet
        assert(viaCounts == direct, s"budget $b diverged")
      }
    }
  }
}
