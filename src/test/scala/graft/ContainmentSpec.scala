package graft

/** q193's asymmetric-containment semantics on documents whose gram
  * overlap is known by construction: a full quote (a small doc that IS
  * a substring of a big one) must score containment 1.0 and flag, an
  * interior excerpt must score exactly |interior grams| / min-side,
  * and an unrelated doc must produce no pair — the case symmetric
  * Jaccard gets wrong (the quote pair's Jaccard is 6/36, far below any
  * dedup threshold).
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[(Long, Long), (Long, Long, Long, Long, Boolean)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-contain-").toString
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q193_containment_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .toMap
  }

  test("full quote scores 1.0 and flags; excerpt scores exact ppm; unrelated pairs nothing") {
    val a = (1 to 40).map(i => s"a$i").mkString(" ")             // 36 grams
    val b = ((1 to 10).map(i => s"b$i") ++ (21 to 32).map(i => s"a$i") ++
      (11 to 20).map(i => s"b$i")).mkString(" ")                 // 28 grams, 8 shared
    val c = (11 to 20).map(i => s"a$i").mkString(" ")            // 6 grams, all ⊂ A
    val dd = (1 to 30).map(i => s"d$i").mkString(" ")            // disjoint
    val out = run(Seq(1L -> a, 2L -> b, 3L -> c, 4L -> dd))
    // doc 3 is literally a substring of doc 1: containment must be 1.0
    val (i13, na13, nb13, ppm13, flag13) = out((1L, 3L))
    assert((i13, na13, nb13) == (6L, 36L, 6L), s"quote pair: $out")
    assert(ppm13 == 1000000L && flag13, "full quote must score 1.0 and flag")
    // the 12-token interior excerpt shares exactly 12-5+1 = 8 grams
    val (i12, na12, nb12, ppm12, flag12) = out((1L, 2L))
    assert((i12, na12, nb12) == (8L, 36L, 28L), s"excerpt pair: $out")
    assert(ppm12 == 1000000L * 8 / 28 && !flag12)
    // no pair may touch the unrelated doc, and B/C share no gram
    assert(out.keySet == Set((1L, 2L), (1L, 3L)), s"extra pairs: ${out.keySet}")
  }
}
