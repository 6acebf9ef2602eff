package graft

import graft.sources.ArtifactStore
import org.apache.spark.sql.functions._

/** The artifact staleness contract (round-12 verdict task): a stored
  * artifact is a pure function of the corpus, so a MUTATED corpus at
  * the same path must invalidate it — the next consumer rebuilds from
  * the new snapshot instead of silently serving ~20 queries stale
  * derived data. ArtifactStore keys every artifact on a fingerprint of
  * the corpus directory's file inventory (path, size, mtime); this
  * spec drives the full lifecycle: build once → cached on re-read →
  * corpus mutated → rebuilt, with the rebuilt content reflecting the
  * new corpus.
  */
class ArtifactStalenessSpec extends SparkSpec {
  import spark.implicits._

  test("a mutated corpus invalidates the stored artifact; an unchanged one stays cached") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stale").toString
    def writeCorpus(n: Int): Unit =
      spark.range(n).select(col("id").as("doc_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/docs.parquet")

    writeCorpus(5)
    var builds = 0
    def artifact() = ArtifactStore.table(spark, dir, "stalespec") {
      builds += 1
      spark.read.parquet(s"$dir/docs.parquet")
        .agg(count(lit(1)).as("n"), max("doc_id").as("mx"))
    }

    assert(artifact().as[(Long, Long)].head() == ((5L, 4L)))
    assert(builds == 1)
    // unchanged corpus: second consumer reads the cached table
    assert(artifact().as[(Long, Long)].head() == ((5L, 4L)))
    assert(builds == 1, "unchanged corpus must not rebuild")

    // mutate the corpus at the SAME path (new snapshot: different file
    // set + sizes); the stale artifact must not be served
    writeCorpus(9)
    assert(artifact().as[(Long, Long)].head() == ((9L, 8L)),
      "consumer after corpus mutation read a STALE artifact")
    assert(builds == 2, "mutated corpus must rebuild exactly once")
    // and the new snapshot is itself cached
    assert(artifact().as[(Long, Long)].head() == ((9L, 8L)))
    assert(builds == 2)
  }

  test("the suffranks artifact follows a day-2 corpus change (r14 verdict #2)") {
    // the REAL stored suffix-rank artifact, driven through its lifecycle:
    // build on day-1 docs, serve cached, then a day-2 corpus change at
    // the SAME path must rebuild — a consumer (q329/q339) may never read
    // ranks computed from yesterday's corpus snapshot
    val dir = java.nio.file.Files.createTempDirectory("graft-stale-sfx").toString
    def writeDocs(texts: Seq[String]): Unit =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // 4-token docs: exactly one valid round-2 (l=4) position per doc,
    // nothing at rounds 4/5/6 — artifact rows == doc count
    writeDocs(Seq("a b c d", "a b c d"))
    assert(graft.operators.DedupQueries.storedSuffixRanks(spark, dir)
      .count() == 2L)
    // unchanged corpus: cached (same table, same count, no rebuild error)
    assert(graft.operators.DedupQueries.storedSuffixRanks(spark, dir)
      .count() == 2L)

    // day-2: the corpus grows at the same path; the artifact must rebuild
    writeDocs(Seq("a b c d", "a b c d", "x y z w"))
    assert(graft.operators.DedupQueries.storedSuffixRanks(spark, dir)
      .count() == 3L,
      "suffranks served a STALE snapshot after the day-2 corpus change")
  }

  test("a mutation NESTED deeper than 3 levels still invalidates (no walk depth cap)") {
    // a multi-level partitioned layout (year=/month=/day=/part.parquet)
    // nests data files 4+ levels below the corpus root; the fingerprint
    // walk used to cap at maxDepth 3, so a mutation down there was
    // invisible and consumers read stale artifacts
    val dir = java.nio.file.Files.createTempDirectory("graft-stale-deep").toString
    val deep = s"$dir/t.parquet/year=2026/month=08/day=15"
    def writeDeep(n: Int): Unit =
      spark.range(n).select(col("id").as("doc_id"))
        .coalesce(1).write.mode("overwrite").parquet(deep)

    writeDeep(3)
    var builds = 0
    def artifact() = ArtifactStore.table(spark, dir, "stalespecdeep") {
      builds += 1
      spark.read.parquet(deep).agg(count(lit(1)).as("n"))
    }
    assert(artifact().as[Long].head() == 3L && builds == 1)
    writeDeep(7)
    assert(artifact().as[Long].head() == 7L,
      "mutation 4 levels deep was invisible to the corpus fingerprint")
    assert(builds == 2)
  }
}
