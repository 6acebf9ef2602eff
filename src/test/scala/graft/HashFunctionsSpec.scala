package graft

import graft.functions.HashFunctions._
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class HashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val k = 16
  private def sig(text: String): List[Long] =
    Seq(text).toDF("text")
      .select(minhashSignature(wordNgrams(col("text"), 2), k).as("v"))
      .collect().head.getSeq[Long](0).toList

  test("minhash: identical docs get identical signatures of length k") {
    val a = sig("to be or not to be that is the question")
    val b = sig("to be or not to be that is the question")
    assert(a == b && a.length == k)
  }

  test("minhash: empty doc gets the all-sentinel signature") {
    assert(sig("") == List.fill(k)(Long.MaxValue))
  }

  test("minhash: permuting shingle order does not change the signature (set semantics)") {
    // same 2-gram multiset reversed at line level -> same mins per seed
    val a = sig("a b c d")
    val grams = Seq(Seq("a b", "b c", "c d").reverse).toDF("g")
      .select(minhashSignature(col("g"), k).as("v")).collect().head.getSeq[Long](0).toList
    assert(a == grams)
  }

  test("minhashJaccard: 1 for identical, 0 for disjoint, bounded between") {
    val df = Seq(("a b c d e f g h", "a b c d e f g h", "q r s t u v w x")).toDF("t1", "t2", "t3")
    val row = df.select(
      minhashJaccard(minhashSignature(wordNgrams(col("t1"), 2), k),
        minhashSignature(wordNgrams(col("t2"), 2), k)).as("same"),
      minhashJaccard(minhashSignature(wordNgrams(col("t1"), 2), k),
        minhashSignature(wordNgrams(col("t3"), 2), k)).as("disj")).collect().head
    assert(row.getAs[Double]("same") == 1.0)
    assert(row.getAs[Double]("disj") == 0.0)
  }

  test("exact jaccard: set semantics with empty-union guard") {
    val df = Seq((Seq("a", "b"), Seq("b", "c"), Seq.empty[String])).toDF("a", "b", "e")
    val row = df.select(
      jaccard(col("a"), col("b")).as("ab"),
      jaccard(col("e"), col("e")).as("ee")).collect().head
    assert(math.abs(row.getAs[Double]("ab") - 1.0 / 3) < 1e-9)
    assert(row.getAs[Double]("ee") == 0.0)
  }

  test("lshBands: bands partition the signature; equal sigs share all band keys") {
    val df = Seq("x y z w v u t s").toDF("text")
      .select(minhashSignature(wordNgrams(col("text"), 2), k).as("sig"))
      .select(lshBands(col("sig"), k, 4).as("b"))
    val bands = df.collect().head.getSeq[org.apache.spark.sql.Row](0).toList
    assert(bands.length == 4)
    assert(bands.map(_.getAs[Int]("band")) == List(0, 1, 2, 3))
  }

  test("minhashText: fused path is whitespace-normalizing, deterministic, sentinel under n tokens") {
    def tsig(t: String): List[Long] =
      Seq(t).toDF("text").select(minhashTextSignature(col("text"), 3, k).as("v"))
        .collect().head.getSeq[Long](0).toList
    val a = tsig("to be or not to be")
    assert(a == tsig("to be or not to be") && a.length == k)
    // runs of spaces/tabs/newlines produce the same token stream
    assert(a == tsig("to\tbe  or\nnot to   be"))
    assert(a != tsig("to be or not to him"))
    // fewer than n tokens -> sentinel
    assert(tsig("only two") == List.fill(k)(Long.MaxValue))
    assert(tsig("") == List.fill(k)(Long.MaxValue))
  }

  test("native wordNgrams is byte-identical to the HOF formulation") {
    val messy = Seq("a b c d", "  leading and\ttabs\nnewlines  ", "", "one",
      "exactly three toks", "unicode héllo wörld …emoji 🙂 end", "a  double  spaces  here")
    val df = messy.toDF("text")
    val rows = df.select(
      wordNgrams(col("text"), 3).as("native"),
      graft.functions.TextFunctions.wordNgramsHof(col("text"), 3).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("minhash_text equals minhash_sig(word_ngrams) — the fusion-rule precondition") {
    val texts = Seq("to be or not to be that is the question",
      "a  b\tc   d e", "", "x y", "single")
    val rows = texts.toDF("text").select(
      minhashTextSignature(col("text"), 3, k).as("fused"),
      minhashSignature(wordNgrams(col("text"), 3), k).as("composed"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("ngram_explode generator matches posexplode(word_ngrams)") {
    graft.functions.HashFunctions.registerAll(spark)
    Seq("a b c d e", "", "x y", "one two three four")
      .toDF("text").createOrReplaceTempView("ngx_t")
    val viaGen = spark.sql(
      "SELECT pos, gram FROM ngx_t LATERAL VIEW ngram_explode(text, 3) g AS pos, gram")
      .collect().map(_.toSeq).toSeq
    val viaExplode = spark.sql(
      "SELECT posexplode(word_ngrams(text, 3)) AS (pos, gram) FROM ngx_t")
      .collect().map(_.toSeq).toSeq
    assert(viaGen.sorted(Ordering.by((s: Seq[Any]) => s.mkString("|"))) ==
      viaExplode.sorted(Ordering.by((s: Seq[Any]) => s.mkString("|"))))
    assert(viaGen.nonEmpty)
  }

  test("minhashText: estimated jaccard tracks overlap direction") {
    val df = Seq(("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
      "w1 w2 w3 w4 w5 w6 w7 w8 w9 zz",
      "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10")).toDF("t1", "t2", "t3")
    val row = df.select(
      minhashJaccard(minhashTextSignature(col("t1"), 3, 64),
        minhashTextSignature(col("t2"), 3, 64)).as("near"),
      minhashJaccard(minhashTextSignature(col("t1"), 3, 64),
        minhashTextSignature(col("t3"), 3, 64)).as("far")).collect().head
    assert(row.getAs[Double]("near") > 0.5)
    assert(row.getAs[Double]("far") == 0.0)
  }

  test("simhash: identical token sets agree; hamming is 0 there and small for near-dups") {
    val df = Seq(("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "completely different words entirely unrelated content here now")).toDF("a", "b", "c")
    val row = df.select(
      hamming64(simhash64(tokens(col("a"))), simhash64(tokens(col("b")))).as("same"),
      hamming64(simhash64(tokens(col("a"))), simhash64(tokens(col("c")))).as("diff"))
      .collect().head
    assert(row.getAs[Number]("same").longValue == 0L)
    assert(row.getAs[Number]("diff").longValue > 3L)
  }

  // texts chosen to hit every kernel edge: multi-whitespace runs, tabs,
  // repeated grams (distinctness), non-ASCII + astral plane (codepoint
  // fold), < n tokens (sentinel/empty), trailing whitespace, empty string
  private val portableEdgeTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a  b\tc   d \n e",
    "x y z x y z x y z", // repeated grams collapse via distinct
    "héllo wörld 𝄞clef naïve café €42 tokens here",
    "two tokens",
    "one",
    "",
    "   \t  ",
    "trailing space run   ")

  test("portable minhash: native fused kernel == HOF formulation on edge-case texts") {
    import graft.operators.DedupQueries
    val df = portableEdgeTexts.zipWithIndex.map(_.swap).toDF("id", "text")
    val nat = df.select(col("id") +: DedupQueries.portableMinhashCols(col("text")): _*)
      .collect().map(r => r.getInt(0) -> r.toSeq.tail).toMap
    val hof = df.select(col("id") +: DedupQueries.portableMinhashColsHof(col("text")): _*)
      .collect().map(r => r.getInt(0) -> r.toSeq.tail).toMap
    assert(nat == hof)
    // short docs are all-NULL, real docs are fully defined
    assert(nat(5).forall(_ == null) && nat(6).forall(_ == null))
    assert(nat(0).forall(_ != null))
  }

  test("portable simhash: native fused kernel == HOF formulation on edge-case texts") {
    import graft.operators.DedupQueries
    val df = portableEdgeTexts.zipWithIndex.map(_.swap).toDF("id", "text")
    val hs = transform(array_distinct(wordNgrams(col("text"), 3)),
      g => graft.functions.TextFunctions.portableStringHash(g))
    val nat = df.select(col("id"),
      portableSimhashNative(col("text"), 3, 24).as("sh"))
      .select(col("id"), col("sh.n_grams"), col("sh.fp"))
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val hof = df.select(col("id"), size(hs).as("n"),
      DedupQueries.portableSimhashHof(hs).as("fp"))
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(nat == hof)
    assert(nat(6) == ((0, 0L))) // empty text: no grams, fp 0
  }

  test("classifier score: native fused kernel == HOF formulation on edge-case texts") {
    import graft.functions.PortableHashKernels.{ClsA, ClsB}
    val df = portableEdgeTexts.zipWithIndex.map(_.swap).toDF("id", "text")
    val nat = df.select(col("id"), classifierScoreNative(col("text")).as("cs"))
      .select(col("id"), col("cs.n_tok"), col("cs.score"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val toks = tokens(col("text"))
    val hof = df.select(col("id"), size(toks).cast("long"),
      aggregate(toks, lit(0L), (acc, t) =>
        acc + (((portableStringHash(t) * ClsA + ClsB) % 1000000007L) % 2001L - 1000L)))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(nat == hof)
    assert(nat(6) == ((0L, 0L)) && nat(7) == ((0L, 0L))) // empty / ws-only
  }

  test("classifier score: BAG semantics — a repeated token votes once per occurrence") {
    val m = Seq((1, "zq"), (2, "zq zq zq")).toDF("id", "text")
      .select(col("id"), classifierScoreNative(col("text")).as("cs"))
      .select(col("id"), col("cs.n_tok"), col("cs.score"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(1)._1 == 1L && m(2)._1 == 3L)
    assert(m(2)._2 == 3L * m(1)._2) // distinct-gram semantics would give 1×
    assert(m(1)._2 != 0L) // non-vacuous: 'zq' carries a real weight
  }
}
