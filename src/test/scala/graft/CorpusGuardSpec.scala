package graft

import org.apache.spark.sql.functions._

/** Pins the corpus assumption the cross-engine tokenization convention
  * rests on: Spark splits tokens on Java's \s (which INCLUDES \x0B,
  * vertical tab) while DuckDB's RE2 \s EXCLUDES \x0B — so every
  * \s-tokenizing oracle pair (q40-family, TF-IDF/BM25, the BPE kernels)
  * hash-matches only while the corpus contains no vertical tab. If the
  * driver's generator ever emits one, this fails with a pointer instead
  * of an inscrutable hash mismatch three suites away.
  */
class CorpusGuardSpec extends SparkSpec {

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"documents at $sf contain no vertical tab (\\x0B)") {
      val n = Tables.documents(spark, s"/root/testdata/$sf")
        .filter(col("text").contains("\u000B")).count()
      assert(n == 0,
        s"$n documents contain \\x0B — Spark \\s and DuckDB RE2 \\s now " +
          "disagree on tokenization; normalize both engines to an explicit " +
          "[ \\t\\n\\x0B\\f\\r]+ class before trusting any \\s-based oracle")
    }

    test(s"documents at $sf are BPE-sentinel-free (chr(1)..chr(${graft.operators.TextQueries.BpeTrainK}))") {
      // q158/q160/q165/q168 stand a merged symbol in for chr(1)..chr(3)
      // during the rewrite, and q174's k-round trainer extends that to
      // chr(BpeTrainK) — bound DERIVED from the constant so bumping k
      // cannot outrun the guard
      val n = Tables.documents(spark, s"/root/testdata/$sf")
        .filter((1 to graft.operators.TextQueries.BpeTrainK)
          .map(c => col("text").contains(c.toChar.toString))
          .reduce(_ || _))
        .count()
      assert(n == 0,
        s"$n documents contain a BPE sentinel char — the literal-replace " +
          "merge encoding (q158/q160/q165/q168/q174) is no longer " +
          "collision-free on this corpus")
    }
  }
}
