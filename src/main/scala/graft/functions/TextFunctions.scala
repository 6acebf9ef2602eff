package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus processing, expressed
  * with built-in (codegen'd) Spark SQL functions only — no UDFs — so they
  * run inside WholeStageCodegen in the scan stage at any scale.
  */
object TextFunctions {

  /** Whitespace tokens; empty array for empty/blank input. Built as
    * split-then-drop-empties because `trim` only strips spaces (a
    * tab-only string would otherwise yield [\"\",\"\"]).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Token count without materializing the token array — one regex scan
    * (matters on long documents: counting is the common case, the array
    * is only needed for n-grams).
    */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** A BPE-ish sub-word token count: words, punctuation runs, and digit
    * runs each count as a token (crude proxy for LLM tokenizers,
    * deterministic).
    */
  def bpeishTokenCount(text: Column): Column =
    // fused native pass ([[TextStats]]) — value- and dtype-identical to
    // regexp_count(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"), one byte
    // scan instead of an alternating regex (differential-tested)
    HashFunctions.textStatsNative(text).getField("n_bpeish")

  /** Word n-gram strings (n consecutive tokens joined by a space) —
    * native kernel ([[WordNgrams]]); byte-identical to [[wordNgramsHof]],
    * one exact-size copy per gram instead of per-element lambda frames.
    */
  def wordNgrams(text: Column, n: Int): Column =
    HashFunctions.wordNgramsNative(text, n)

  /** Higher-order-function formulation — kept as the differential
    * reference the native kernel is tested against. */
  def wordNgramsHof(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Character n-gram (shingle) strings over the raw text. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  /** Heuristic quality score in [0,1]: combines length band, alpha ratio,
    * mean word length band, and punctuation density. Deterministic.
    */
  def qualityScore(text: Column): Column = {
    // counts from the fused native pass ([[TextStats]]): alpha is
    // value-identical to length(regexp_replace(text, "[^A-Za-z ]", ""))
    // and n_tokens to regexp_count(text, "\S+") — but ONE byte scan
    // replaces two regex executions (one of which materialized a
    // filtered copy of the text just to measure it). The arithmetic
    // below is unchanged, so the rounded score stays bit-identical.
    val st = HashFunctions.textStatsNative(text)
    val len = length(text).cast("double")
    val alpha = st.getField("alpha").cast("double")
    val alphaRatio = when(len > 0, alpha / len).otherwise(lit(0.0))
    val nTok = st.getField("n_tokens").cast("double")
    val meanWordLen = when(nTok > 0, len / nTok).otherwise(lit(0.0))
    val lenScore = when(len >= 200 && len <= 20000, lit(1.0))
      .when(len >= 50, lit(0.5)).otherwise(lit(0.0))
    val wordScore = when(meanWordLen >= 3 && meanWordLen <= 12, lit(1.0)).otherwise(lit(0.3))
    round((lenScore * 0.4 + alphaRatio * 0.4 + wordScore * 0.2), 4)
  }

  /** Tiny n-gram/stopword language-ID heuristic over {en,de,fr,es,zh}.
    * Scores = count of language-marker TOKENS (token equality, so
    * consecutive markers like "la la" each count — a literal-split count
    * would consume the shared delimiter and systematically undercount);
    * argmax with 'en' fallback. Deterministic; meant as the shape of a
    * real fastText-style classifier (per-row scan-stage scoring, no
    * shuffle).
    */
  def langIdHeuristic(text: Column): Column = {
    val toks = tokens(lower(text))
    def score(markers: Seq[String]): Column =
      size(filter(toks, t => t.isin(markers: _*)))
    val en = score(Seq("the", "and", "of", "to", "is"))
    val de = score(Seq("der", "die", "und", "ist", "das"))
    val fr = score(Seq("le", "la", "et", "est", "les"))
    val es = score(Seq("el", "la", "y", "es", "los"))
    val zh = size(split(text, "[\\u4e00-\\u9fff]")) - 1
    // argmax with deterministic tie-break order en>de>fr>es>zh
    val pairs = Seq("en" -> en, "de" -> de, "fr" -> fr, "es" -> es, "zh" -> zh)
    val best = greatest(pairs.map(_._2): _*)
    pairs.foldRight(lit("en")) { case ((l, s), acc) => when(s === best && best > 0, lit(l)).otherwise(acc) }
  }

  /** 64-bit rolling document fingerprint over tokens: left-fold
    * fp = xxhash64(fp, token_i) — order-sensitive, overflow-free.
    * Fingerprint equality ⇒ identical token sequence (w.h.p.).
    */
  def docFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, tok) => xxhash64(acc, tok))

  /** ENGINE-PORTABLE rolling fingerprint: nested polynomial hash in
    * exact modular arithmetic — per token fold (a*131 + codepoint) mod
    * 1e9+7 over its characters, then fold (fp*1000003 + tokenHash) mod
    * 1e9+7 over the token sequence. Every step stays far below 2^63, so
    * any engine with 64-bit integers reproduces it bit-exactly (DuckDB
    * oracle does, q98) — which is the point: a fingerprint that survives
    * engine migration, unlike [[docFingerprint]]'s xxhash64 family.
    * Same whitespace-insensitive, order-sensitive contract.
    *
    * Unicode contract: the fold is over CODEPOINTS, non-ASCII included.
    * On Spark 4.x `ascii()` returns the full codepoint of the first
    * character (astral plane too — ascii('𝄞')=119070, verified) and
    * `split(t, "")` yields whole characters (a surrogate pair stays one
    * element), which matches DuckDB's `unicode(c)` over per-character
    * `string_split` exactly — locked by the non-ASCII case in
    * TextFunctionsSpec against a cross-engine-computed constant. On
    * engines where ascii() is first-UTF-8-byte (e.g. Spark 3.x) this
    * fold is NOT portable; reimplement the codepoint fold before use.
    */
  def portableFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * 1000003L + portableStringHash(t)) % 1000000007L)

  /** ENGINE-PORTABLE polynomial string hash: fold (a*131 + codepoint)
    * mod 1e9+7 over the string's characters — the per-token kernel of
    * [[portableFingerprint]] (same Unicode contract: Spark `ascii()` ≡
    * DuckDB `unicode()` per character, astral plane included). Exposed
    * on its own so other portable constructions (MinHash, SimHash) can
    * share the exact gram-hash a migrating engine can reproduce in SQL.
    * Result is in [0, 1e9+7): ~30 bits of hash, exact in any int64.
    */
  def portableStringHash(s: Column): Column =
    aggregate(split(s, ""), lit(0L), (a, c) => (a * 131L + ascii(c)) % 1000000007L)

  /** Gopher-style repetition stats (Rae et al. 2021 §A1.1), scan-local
    * and engine-portable (plain integer ratios, rounded to 6 places).
    * maxUnigramFrac: share of the token stream taken by the single most
    * frequent token (O(n·distinct) per row — bounded by doc length).
    */
  def maxUnigramFrac(text: Column): Column = maxUnigramFracArr(tokens(text))

  /** Array-input form. Callers that already materialized the token array
    * as a column attribute MUST use this one: passing `tokens(text)` by
    * expression re-runs the regex split inside the lambda — once per
    * DISTINCT TOKEN per row (lambda bodies get no subexpression
    * elimination) — where an attribute is a plain array read. ~2× on the
    * q117 scan at sf0.1.
    */
  def maxUnigramFracArr(l: Column): Column = {
    val maxCnt = array_max(transform(array_distinct(l),
      t => size(filter(l, x => x === t))))
    round(when(size(l) === 0, lit(0.0))
      .otherwise(maxCnt.cast("double") / size(l)), 6)
  }

  /** Fraction of word-3-gram positions that repeat an earlier 3-gram of
    * the same document (1 − distinct/total) — the duplicate-phrase
    * signal of the Gopher repetition filters. */
  def dupTrigramFrac(text: Column): Column = {
    val tris = wordNgrams(text, 3)
    round(when(size(tris) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(tris)).cast("double") / size(tris)), 6)
  }
}
