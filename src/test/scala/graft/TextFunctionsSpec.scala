package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect().head.getAs[T]("v")

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): List[String] =
    Seq(text).toDF("text").select(c.as("v")).collect().head.getSeq[String](0).toList

  test("tokens splits on any whitespace run") {
    assert(oneSeq(tokens(col("text")), "a  b\tc\nd") == List("a", "b", "c", "d"))
  }

  test("tokens of empty and blank input is empty array, not [\"\"]") {
    assert(oneSeq(tokens(col("text")), "") == List())
    assert(oneSeq(tokens(col("text")), "   \t ") == List())
  }

  test("tokenCount matches token array size") {
    assert(one[Int](tokenCount(col("text")), "the quick brown fox") == 4)
    assert(one[Int](tokenCount(col("text")), "") == 0)
  }

  test("bpeish token count splits word/punct/digit boundaries") {
    // "don't stop: 42km" -> don | ' | t | stop | : | 42 | km
    assert(one[Int](bpeishTokenCount(col("text")), "don't stop: 42km") == 7)
    assert(one[Int](bpeishTokenCount(col("text")), "") == 0)
  }

  test("wordNgrams produces n-1 fewer grams than tokens; short input empty") {
    assert(oneSeq(wordNgrams(col("text"), 3), "a b c d") == List("a b c", "b c d"))
    assert(oneSeq(wordNgrams(col("text"), 3), "a b") == List())
  }

  test("charShingles covers the string; short input empty") {
    assert(oneSeq(charShingles(col("text"), 3), "abcd") == List("abc", "bcd"))
    assert(oneSeq(charShingles(col("text"), 5), "abcd") == List())
  }

  test("qualityScore in [0,1] and favors normal prose over junk") {
    val prose = "The quick brown fox jumps over the lazy dog. " * 10
    val junk = "@@@@ #### $$$$ %%%%"
    val pq = one[Double](qualityScore(col("text")), prose)
    val jq = one[Double](qualityScore(col("text")), junk)
    assert(pq >= 0 && pq <= 1 && jq >= 0 && jq <= 1 && pq > jq)
  }

  test("langIdHeuristic picks marker language, falls back to en") {
    assert(one[String](langIdHeuristic(col("text")), "the cat and the dog is here") == "en")
    assert(one[String](langIdHeuristic(col("text")), "der Hund und die Katze ist da") == "de")
    assert(one[String](langIdHeuristic(col("text")), "xyzzy plugh") == "en")
  }

  test("docFingerprint is order-sensitive and whitespace-insensitive") {
    val fp1 = one[Long](docFingerprint(col("text")), "a b c")
    val fp2 = one[Long](docFingerprint(col("text")), "a  b\tc")
    val fp3 = one[Long](docFingerprint(col("text")), "c b a")
    assert(fp1 == fp2)
    assert(fp1 != fp3)
  }

  test("portableFingerprint: same contract, exact modular value any engine can reproduce") {
    val fp1 = one[Long](portableFingerprint(col("text")), "a b c")
    val fp2 = one[Long](portableFingerprint(col("text")), "a  b\tc")
    val fp3 = one[Long](portableFingerprint(col("text")), "c b a")
    assert(fp1 == fp2)
    assert(fp1 != fp3)
    // the spec'd fold, computed independently: per token (a*131+cp)%P,
    // across tokens (fp*1000003+tokHash)%P
    val P = 1000000007L
    def tok(t: String) = t.foldLeft(0L)((a, c) => (a * 131L + c.toLong) % P)
    val want = Seq("a", "b", "c").foldLeft(0L)((a, t) => (a * 1000003L + tok(t)) % P)
    assert(fp1 == want)
  }

  test("portableFingerprint is codepoint-true on non-ASCII (incl. astral plane)") {
    // "héllo wörld 𝄞clef — naïve café €42" via unicode escapes so the test
    // is immune to source-file locale; 𝄞 (U+1D11E) is a surrogate pair in
    // UTF-16, the case where a code-unit fold would diverge from DuckDB.
    val text = "h\u00E9llo w\u00F6rld \uD834\uDD1Eclef \u2014 na\u00EFve caf\u00E9 \u20AC42"
    // 905374792 was computed by BOTH the q98 DuckDB oracle expression and an
    // independent python fold over ord(char) — cross-engine ground truth.
    // It only matches if Spark's ascii() yields full codepoints (astral
    // included) and split(t,"") yields whole characters, which holds on
    // Spark 4.x; a UTF-16-code-unit or first-UTF-8-byte fold gives a
    // different value and must fail here.
    assert(one[Long](portableFingerprint(col("text")), text) == 905374792L)
    // per-codepoint reference fold in-JVM (codePoints, not chars)
    val P = 1000000007L
    def tok(t: String) = t.codePoints.toArray.foldLeft(0L)((a, c) => (a * 131L + c) % P)
    val want = text.split("\\s+").filter(_.nonEmpty)
      .foldLeft(0L)((a, t) => (a * 1000003L + tok(t)) % P)
    assert(want == 905374792L)
  }
}
