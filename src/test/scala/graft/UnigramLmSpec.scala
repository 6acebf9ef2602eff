package graft

import graft.functions.UnigramSegment
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Properties of the unigram-LM trainer/apply pair (q299/q300) the
  * hash-match can't articulate on its own, plus kernel-level pins.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def seg(word: String, vocab: Seq[(String, Long)]): String = {
    val p = ArrayData.toArrayData(vocab.map(v => UTF8String.fromString(v._1)).toArray)
    val w = ArrayData.toArrayData(vocab.map(_._2).toArray)
    val r = UnigramSegment.kernel(UTF8String.fromString(word), p, w)
    if (r == null) null else r.toString
  }

  test("kernel never emits a piece outside the vocabulary (the boxed-null regression)") {
    // a primitive-valued HashMap unboxed get()'s null to 0L — weight 0
    // beat every real (negative) weight, so unknown substrings like
    // 'col' won the DP; this pins the fix
    val vocab = Seq(("co", -352000L), ("lumn", -352000L)) ++
      "column".distinct.map(c => (c.toString, -1001420L))
    val got = seg("column", vocab)
    assert(got == "co\tlumn", s"got $got")
    got.split("\t").foreach(p =>
      assert(vocab.exists(_._1 == p), s"piece '$p' not in vocab"))
  }

  test("kernel tie-breaking: equal score and piece count prefers the longer last piece") {
    val vocab = Seq(("ab", -100L), ("cd", -100L), ("abc", -100L), ("d", -100L),
      ("a", -900L), ("b", -900L), ("c", -900L))
    // abc|d and ab|cd both score -200 with np=2; lastLen 1 vs 2 → ab|cd
    assert(seg("abcd", vocab) == "ab\tcd")
  }

  test("kernel: fewer pieces win at equal score; unreachable word is null") {
    // 'aa' as one piece scores -200; 'a'+'a' also sums to -200 — the
    // equal-score tie must go to the single piece (smaller np)
    assert(seg("aa", Seq(("aa", -200L), ("a", -100L))) == "aa")
    assert(seg("ax", Seq(("a", -100L))) == null, "missing char must be loudly null")
  }

  test("llog is monotone, exact at powers of two, and matches the SQL formula shape") {
    assert(UnigramSegment.llog(1) == 0)
    (0 to 40).foreach(k => assert(UnigramSegment.llog(1L << k) == k.toLong << 16))
    // strictly monotone while the 2⁻¹⁶ grid can still resolve the gap
    // (x < 2³², where one grid step spans < x/2¹⁶ ≤ 2¹⁶ integers);
    // only non-strict beyond it — quantization, not a defect
    val xs = Seq(1L, 2L, 3L, 7L, 978L, 65535L, 65536L, 65537L, 1L << 30)
    xs.sliding(2).foreach { case Seq(a, b) =>
      assert(UnigramSegment.llog(a) < UnigramSegment.llog(b), s"$a vs $b")
    }
    assert(UnigramSegment.llog(1L << 40) <= UnigramSegment.llog((1L << 40) + 12345))
  }

  test("q300 segmentations are lossless and every piece is in q299's vocab") {
    val vocab = SparkEntry.queries("q299_unigram_lm_train")(spark, d)
      .select("piece").as[String].collect().toSet
    assert(vocab.nonEmpty && vocab.exists(_.length > 1),
      "trained vocab must contain multi-char pieces")
    val rows = SparkEntry.queries("q300_unigram_lm_apply")(spark, d)
      .select("word", "n_pieces", "seg").as[(String, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (word, np, s) =>
      val parts = s.split("\t")
      assert(parts.mkString("") == word, s"lossy segmentation of '$word': $s")
      assert(parts.length.toLong == np)
      parts.foreach(p => assert(vocab(p), s"piece '$p' of '$word' not in trained vocab"))
    }
    // the trainer actually learned something: some multi-char word is
    // covered by a single learned piece
    assert(rows.exists(r => r._1.length > 1 && !r._3.contains("\t")),
      "apply must produce whole-word pieces somewhere, not all-chars")
  }

  test("trainer is deterministic across invocations (artifact rebuild equals read-back)") {
    val a = SparkEntry.queries("q299_unigram_lm_train")(spark, d)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val b = SparkEntry.queries("q299_unigram_lm_train")(spark, d)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }
}
