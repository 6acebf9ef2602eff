package graft

/** q376's per-source unseen-mass profile on a hand-computable corpus:
  * source A = "a a b c" → V = 3, N = 4, V₁ = 2, V₂ = 1, hapax 2/3,
  * unseen mass P₀ = 2/4, adjusted hapax count r*₁ = 2·V₂/V₁ = 1.0
  * exactly; source B = "x y" (all hapax) → P₀ = 1, V₂ = 0 → r*₁ = 0
  * (GT: hapaxes backed by no doubletons are worth nothing — the
  * noise-tail verdict).
  */
class SourceUnseenSpec extends SparkSpec {
  import spark.implicits._

  test("two-source fixture: hapax share, unseen mass, adjusted hapax count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-unseen-").toString
    try {
      Seq((1L, "a a b c", "en", "A", 7L), (2L, "x y", "en", "B", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val out = SparkEntry.queries("q376_source_unseen_mass")(spark, dir)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6),
            if (r.isNullAt(7)) -1L else r.getLong(7))))
        .toMap
      assert(out("A") == ((3L, 4L, 2L, 1L, 666666L, 500000L, 1000000L)),
        s"A: ${out("A")}")
      assert(out("B") == ((2L, 2L, 2L, 0L, 1000000L, 1000000L, 0L)),
        s"B: ${out("B")}")
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
      finally walk.close()
    }
  }
}
