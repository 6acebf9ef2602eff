package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Semantics of the repetition-filter primitives on crafted inputs (the
  * DuckDB oracle checks them on real testdata; this pins the math on
  * documents whose right answer is known by hand).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def stats(texts: String*): Seq[(Double, Double)] =
    texts.toDF("text")
      .select(maxUnigramFrac(col("text")), dupTrigramFrac(col("text")))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq

  test("max unigram fraction: hand-computed cases") {
    val Seq(a, b, c, d) = stats(
      "a b c d",        // all unique -> 1/4
      "a a a b",        // 3/4
      "spam spam spam", // 1.0
      "")               // empty -> 0
      .map(_._1)
    assert(a == 0.25 && b == 0.75 && c == 1.0 && d == 0.0)
  }

  test("duplicate trigram fraction: hand-computed cases") {
    val Seq(a, b, c) = stats(
      "a b c d e",         // 3 trigrams, all distinct -> 0
      "a b a b a b a b",   // 6 trigrams, 2 distinct -> 1 - 2/6
      "x y")               // too short -> 0
      .map(_._2)
    assert(a == 0.0 && c == 0.0)
    // the stat is rounded to 6 places by contract
    assert(b == 0.666667)
  }

  test("repetition stats are whitespace-robust (tabs, runs of spaces)") {
    val Seq((muf, dtf)) = stats("a\t\ta  a   b")
    assert(muf == 0.75 && dtf == 0.0)
  }

  test("q184: the CMS point estimate NEVER underestimates, and errors are collision mass") {
    val rows = SparkEntry.queries("q184_cms_error_profile")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20, "profile must cover exactly the top-20 tokens")
    rows.foreach { case (tok, freq, est, err) =>
      assert(est >= freq, s"'$tok': CMS est $est < true freq $freq — impossible")
      assert(err == est - freq)
    }
  }

  test("q188: JS divergence stays in [0, 1] bits and covers every source pair once") {
    val rows = SparkEntry.queries("q188_source_divergence")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case ((sa, sb), js) =>
      assert(sa < sb, "matrix must be strictly upper-triangular")
      // micro-rounding can push a hair past the analytic bound, never more
      assert(js >= -1e-4 && js <= 1.0 + 1e-4, s"($sa,$sb): JS $js outside [0,1]")
    }
    assert(rows.map { case ((a, b), _) => (a, b) }.distinct.length == rows.length)
  }

  test("q183/q187 treat a NULL-text doc as an empty token stream, not NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cls-null-").toString
    Seq(
      (1L, "alpha beta gamma", "en", "a", 16L),
      (2L, null.asInstanceOf[String], "en", "b", 0L),
      (3L, "solo", "en", "c", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cls = SparkEntry.queries("q183_classifier_score")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(cls(2L) == ((0L, 0L, false)), s"NULL-text doc: ${cls(2L)}")
    assert(cls(1L)._1 == 3L)
    val lm = SparkEntry.queries("q187_bigram_lm_score")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.isNullAt(2)))).toMap
    // NULL text and a 1-token doc both have zero bigrams and a NULL score
    assert(lm(2L) == ((0L, true)) && lm(3L) == ((0L, true)))
    assert(lm(1L)._1 == 2L)
  }

  test("q183: the classifier cut is non-vacuous on the corpus (both classes present)") {
    val keeps = SparkEntry.queries("q183_classifier_score")(
      spark, "/root/testdata/sf0.001").collect().map(_.getBoolean(3))
    assert(keeps.contains(true) && keeps.contains(false))
  }
}
