package graft

/** Pins q310's blocking-and-verification theorem: for strings a ≠ b,
  * Levenshtein(a, b) = 1 EXACTLY when the deletion-neighborhood join
  * finds a shared variant whose positions satisfy the witness predicate
  * (posA = 0 ∨ posB = 0 ∨ posA = posB, where 0 marks the identity
  * variant) — recall 1 (no distance-1 pair is missed by the blocking)
  * AND precision 1 (the positional predicate admits no distance-≥2
  * pair), so the engine needs no per-pair edit-distance DP.
  */
class DeletionNeighborhoodSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val rnd = new scala.util.Random(0xDE1)

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** (variant, pos) set: pos 0 = identity, i = deletion at 1-based i. */
  private def vars(s: String): Seq[(String, Int)] =
    (s, 0) +: (1 to s.length).map(i => (s.take(i - 1) + s.drop(i), i))

  private def witness(a: String, b: String): Boolean =
    vars(a).exists { case (va, pa) =>
      vars(b).exists { case (vb, pb) =>
        va == vb && (pa == 0 || pb == 0 || pa == pb)
      }
    }

  private def randStr(n: Int): String =
    (1 to n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString

  test("recall 1: every single random edit is found by a positional witness") {
    for (_ <- 1 to 300) {
      val a = randStr(3 + rnd.nextInt(10))
      val b = rnd.nextInt(3) match {
        case 0 => // substitution (may be a no-op edit; skip those)
          val i = rnd.nextInt(a.length)
          a.updated(i, ('a' + rnd.nextInt(4)).toChar)
        case 1 => // deletion
          val i = rnd.nextInt(a.length); a.take(i) + a.drop(i + 1)
        case _ => // insertion
          val i = rnd.nextInt(a.length + 1)
          a.take(i) + ('a' + rnd.nextInt(4)).toChar + a.drop(i)
      }
      if (a != b) {
        assert(lev(a, b) == 1, s"edit construction broke: $a / $b")
        assert(witness(a, b), s"blocking missed distance-1 pair $a / $b")
      }
    }
  }

  test("precision 1: the witness predicate admits exactly the distance-1 pairs") {
    // small alphabet + short strings makes distance-2-sharing-a-variant
    // collisions (transpositions etc.) common — the case the predicate
    // must REJECT and a bare shared-variant join would admit
    for (_ <- 1 to 2000) {
      val a = randStr(2 + rnd.nextInt(5))
      val b = randStr(2 + rnd.nextInt(5))
      if (a != b)
        assert(witness(a, b) == (lev(a, b) == 1), s"diverged on $a / $b")
    }
  }
}
