package graft

/** The property q185's hash oracle can't state directly: Schleimer et
  * al.'s winnowing GUARANTEE — any shared token run of length ≥
  * WinnowW + SpanK − 1 produces at least one shared fingerprint, and
  * each selected position covers at most WinnowW windows, so a run of
  * L tokens shares ≥ ⌈(L − WinnowW − SpanK + 2) / WinnowW⌉ distinct
  * fingerprints. Checked on crafted documents whose shared-run lengths
  * are known by construction.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow-").toString
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q185_winnowing_fingerprints")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("winnowing guarantee: a 30-token shared run across different contexts is caught") {
    val run = (1 to 30).map(i => s"run$i").mkString(" ")
    val p = pairs(Seq(
      1L -> s"alpha beta gamma delta epsilon $run omega psi chi phi",
      2L -> s"one two three four five six $run seven eight nine ten",
      3L -> s"alpha beta gamma delta epsilon $run omega psi chi phi", // exact dup of 1
      4L -> "totally unrelated words with nothing in common here at all today"))
    // interior windows of the run: L−K+1 grams → L−K−W+2 = 23 windows,
    // each selection covering ≤ W=4 of them → ≥ 6 shared fingerprints
    assert(p.contains((1L, 2L)) && p((1L, 2L)) >= 6L, s"run pair missing/weak: $p")
    assert(p.contains((2L, 3L)) && p((2L, 3L)) == p((1L, 2L)),
      "exact dup must share exactly what its twin shares with doc 2")
    // the exact-dup pair shares EVERY fingerprint, strictly more than the run pair
    assert(p((1L, 3L)) > p((1L, 2L)))
    assert(!p.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "the unrelated doc must produce no candidate pair")
  }

  test("winnowing is position-robust: a long prefix shift preserves the run's fingerprints") {
    val run = (1 to 20).map(i => s"core$i").mkString(" ")
    val p = pairs(Seq(
      1L -> s"$run trailing words here",
      2L -> s"a much longer and entirely different leading context than before $run"))
    // 20-token run → 16 gram positions → 13 interior windows → ≥ 4 shared
    assert(p.contains((1L, 2L)) && p((1L, 2L)) >= 4L, s"shifted run lost: $p")
  }
}
