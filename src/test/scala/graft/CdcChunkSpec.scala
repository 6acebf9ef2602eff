package graft

/** The claim q202 exists for, tested mechanically: content-defined
  * boundaries REALIGN after an edit. Prepending a token to a document
  * shifts every fixed-window chunk (q77's 512-token grid would share
  * nothing), but CDC boundaries are cut by the rolling hash of the
  * CONTENT, so every chunk after the first post-edit boundary is
  * bit-identical between the two versions and dedups.
  */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.map { case (id, tx) =>
      (id, tx, "en", "src", Option(tx).map(_.length.toLong).getOrElse(0L)) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def rmrf(dir: String): Unit = {
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }

  test("a prepended token leaves all but the head chunks shared (boundary realignment)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-").toString
    try {
      val base = (0 until 60).map(i => s"tok$i").mkString(" ")
      writeDocs(dir, Seq(1L -> base, 2L -> s"inserted $base"))
      val rows = SparkEntry.queries("q202_cdc_chunks")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))) // (fp, n_docs, keeper)
      val doc1Chunks = rows.count(r => r._3 == 1L)
      val shared = rows.count(_._2 == 2L)
      assert(doc1Chunks >= 3,
        s"fixture too small to be meaningful: doc1 has $doc1Chunks chunks")
      assert(shared >= doc1Chunks - 2,
        s"only $shared of $doc1Chunks chunks realigned after the edit — " +
          "content-defined boundaries are broken")
      assert(shared >= 1, "no chunk deduped across the edit at all")
    } finally rmrf(dir)
  }

  test("NULL and empty texts produce no chunks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-null-").toString
    try {
      writeDocs(dir, Seq(1L -> null, 2L -> "", 3L -> "   "))
      assert(SparkEntry.queries("q202_cdc_chunks")(spark, dir).count() == 0)
    } finally rmrf(dir)
  }
}
