package graft

/** Containment proof for q339 (r13 verdict #5): every removable
  * exact-substring span (32-/64-token suffix-rank grain) lies inside the
  * UNION of q175's 5-gram duplicate islands on the same corpus. The
  * theorem: an L-token window that recurs has every one of its 5-grams
  * recurring, so each constituent removable window sits fully inside ONE
  * island; a merged span is a union of such windows, hence inside the
  * islands' union. The spec's island oracle is INDEPENDENT — plain
  * driver-side Scala over the raw text (the corpus is 500 docs at
  * sf0.001), no shared code with q175 or q339.
  */
class ExactSubstringSpansSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val docs: Map[Long, Array[String]] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        Option(r.getString(1)).getOrElse("").split("\\s+").filter(_.nonEmpty))
      .toMap

  /** count of each k-gram across the corpus */
  private def gramCounts(k: Int): Map[Seq[String], Int] = {
    val all = docs.iterator.flatMap { case (_, toks) =>
      toks.sliding(k).filter(_.length == k).map(_.toSeq) }
    all.foldLeft(Map.empty[Seq[String], Int]) { (m, g) =>
      m.updated(g, m.getOrElse(g, 0) + 1) }
  }

  /** per doc: q175-style islands of consecutive duplicated 5-gram starts,
    * as covered TOKEN intervals [s, e + 5) */
  private lazy val islandIntervals: Map[Long, Seq[(Int, Int)]] = {
    val counts = gramCounts(5)
    docs.map { case (id, toks) =>
      val dupStarts = toks.sliding(5).zipWithIndex
        .collect { case (g, i) if g.length == 5 && counts(g.toSeq) >= 2 => i }
        .toArray.sorted
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      for (p <- dupStarts) runs.lastOption match {
        case Some((s, e)) if p == e + 1 => runs(runs.length - 1) = (s, p)
        case _ => runs += ((p, p))
      }
      id -> runs.toSeq.map { case (s, e) => (s, e + 5) }
    }
  }

  private lazy val spans: Seq[(Long, Long, Long, Long, Long)] =
    SparkEntry.queries("q339_exact_substring_spans")(spark, sfDir)
      .select("prefix_len", "doc_id", "span_start", "span_end", "n_starts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("spans exist at both grains (the corpus carries 32- and 64-token duplication)") {
    assert(spans.count(_._1 == 32L) > 0)
    assert(spans.count(_._1 == 64L) > 0)
  }

  test("every q339 span is contained in the union of q175's 5-gram dup islands") {
    for ((l, id, a, b, _) <- spans) {
      val cover = islandIntervals.getOrElse(id, Seq.empty)
      val uncovered = (a until b).filterNot(t => cover.exists { case (s, e) => t >= s && t < e })
      assert(uncovered.isEmpty,
        s"doc $id L=$l span [$a,$b) has uncovered token positions ${uncovered.take(5)}; islands=$cover")
    }
  }

  test("keep-first holds: removable starts are strictly fewer than duplicated positions") {
    // every rank group keeps its canonical occurrence, so the removable
    // count must be < the count of positions whose L-window recurs
    for (l <- Seq(32, 64)) {
      val counts = gramCounts(l)
      val dupPositions = docs.valuesIterator.map { toks =>
        toks.sliding(l).count(g => g.length == l && counts(g.toSeq) >= 2) }.sum
      val removable = spans.filter(_._1 == l).map(_._5).sum
      assert(removable > 0 && removable < dupPositions,
        s"L=$l removable=$removable dupPositions=$dupPositions")
    }
  }

  test("spans are maximal and well-formed: positive length, multiple of nothing, no overlap within a doc+grain") {
    for (l <- Seq(32L, 64L)) {
      val byDoc = spans.filter(_._1 == l).groupBy(_._2)
      for ((id, ss) <- byDoc) {
        val sorted = ss.sortBy(_._3)
        sorted.foreach { case (_, _, a, b, _) => assert(b - a >= l, s"doc $id span [$a,$b) shorter than $l") }
        sorted.sliding(2).foreach {
          case Seq((_, _, _, e1, _), (_, _, s2, _, _)) =>
            // merged at gap <= L means consecutive spans are > L apart
            assert(s2 - e1 > 0, s"doc $id grain $l spans overlap: end=$e1 next=$s2")
          case _ =>
        }
      }
    }
  }
}
