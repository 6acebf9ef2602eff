package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.functions._

/** The prefix-filtering theorem, tested: every pair with 3-gram
  * Jaccard ≥ 0.5 shares at least one prefix gram under the global
  * (df, gram) order, so q274's candidate generation has recall
  * EXACTLY 1 against the all-pairs ground truth — and its verified
  * output equals the truth set, pair for pair, including the exact
  * intersection sizes.
  */
class PrefixFilterSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def gramSets = {
    Tables.documents(spark, d).createOrReplaceTempView("graft_docs_pfspec")
    graft.functions.HashFunctions.registerAll(spark)
    spark.sql(
      """SELECT DISTINCT doc_id, gram AS tok FROM graft_docs_pfspec
        |LATERAL VIEW ngram_explode(text, 3) g AS pos, gram""".stripMargin)
  }

  test("verified prefix-filter pairs == all-pairs gram-Jaccard >= 0.5 truth") {
    val tk = gramSets
    val sz = tk.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // ground truth WITHOUT any filtering: pairs sharing >= 1 gram (a
    // J >= 0.5 pair must share grams), exact intersection, then the
    // same 3i >= |a|+|b| cross-multiplication
    val truth = tk.as("a").join(tk.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .agg(count(lit(1)).as("i"))
      .join(sz.select(col("doc_id").as("ia"), col("sz").as("sz_a")), Seq("ia"))
      .join(sz.select(col("doc_id").as("ib"), col("sz").as("sz_b")), Seq("ib"))
      .filter(col("i") * 3 >= col("sz_a") + col("sz_b"))
      .select("ia", "ib", "i").as[(Long, Long, Long)].collect().toSet

    val got = DedupQueries.prefixFilterPairs(spark, d)
      .select("ia", "ib", "i").as[(Long, Long, Long)].collect().toSet

    assert(got == truth,
      s"got=${got.size} truth=${truth.size}; " +
        s"missing=${(truth -- got).take(5)} extra=${(got -- truth).take(5)}")
    assert(truth.nonEmpty, "corpus must contain gram-Jaccard >= 0.5 pairs")
  }

  test("prefix postings are strictly smaller than full postings (the filter filters)") {
    val tk = gramSets
    val full = tk.count()
    val dfq = tk.groupBy("tok").agg(count(lit(1)).as("df"))
    val sz = tk.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pfx = tk.join(dfq, Seq("tok")).join(sz, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df"), col("tok"))).cast("long"))
      .filter(col("rk") <= col("sz") - expr("(sz + 1) div 2") + 1)
      .count()
    assert(pfx < full, s"prefix=$pfx full=$full")
    assert(pfx * 3 < full * 2, // ~half + 1 per doc
      s"prefix postings should be about half the full postings: $pfx vs $full")
  }
}
