package graft

/** q190's status semantics on a corpus crafted to hit every branch:
  * added / removed / changed / unchanged, the NULL-safe digest compare
  * (a NULL-text doc present in both snapshots is `unchanged`, even when
  * the changed-text rule touches it — 'v1 ' || NULL is NULL), and the
  * both-excluded id that must appear in neither snapshot.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[String, (Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-snapdiff-").toString
    docs.map { case (id, t) =>
      (id, t, "en", "s1", if (t == null) 0L else t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q190_snapshot_diff")(spark, dir)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
  }

  test("every status branch, the NULL-safe compare, and the both-excluded id") {
    val out = run(Seq(
      1L -> "plain text present in both versions", // all mods miss -> unchanged
      2L -> "text that gets a v1 prefix in old",   // 2%7=2  -> changed
      3L -> "only exists in the new snapshot",     // 3%13=3 -> added
      5L -> "only exists in the old snapshot",     // 5%11=5 -> removed
      8L -> null,                                  // NULL in both -> unchanged
      16L -> "excluded from BOTH snapshots",       // 16%13=3 AND 16%11=5 -> no row
      27L -> "also only in the old snapshot",      // 27%11=5 -> removed
      30L -> null,                                 // 30%7=2 but 'v1 '||NULL is NULL -> unchanged
      107L -> "new-only and also a changed id"))   // 107%13=3 wins -> added
    assert(out("unchanged")._1 == 3L, s"unchanged: $out") // 1, 8, 30
    assert(out("changed")._1 == 1L, s"changed: $out")     // 2
    assert(out("added")._1 == 2L, s"added: $out")         // 3, 107
    assert(out("removed")._1 == 2L, s"removed: $out")     // 5, 27
    // doc counts across statuses cover old ∪ new exactly once: 9 ids
    // minus the both-excluded one
    assert(out.values.map(_._1).sum == 8L)
    // removed chars come from the OLD side (27%7≠2, so no v1 prefix)
    assert(out("removed")._2 ==
      "only exists in the old snapshot".length + "also only in the old snapshot".length)
    // changed chars come from the NEW side (no 'v1 ' prefix in the sum)
    assert(out("changed")._2 == "text that gets a v1 prefix in old".length)
  }
}
