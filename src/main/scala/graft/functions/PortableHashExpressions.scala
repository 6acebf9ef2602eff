package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the ENGINE-PORTABLE hash family (q98–q100): exact
  * modular arithmetic any engine reproduces bit-identically, fused into
  * one JIT'd pass per document. The HOF formulations of the same math
  * (`TextFunctions.portableStringHash` + array transforms) are the
  * spec: higher-order functions are CodegenFallback in Spark, so a
  * k-stream MinHash through them re-evaluates the interpreted gram-hash
  * chain once per stream — 16 s at sf0.1 where this kernel takes a
  * fraction of a second. Differential tests pin kernel ≡ HOF.
  *
  * Semantics shared with the DuckDB oracles (do not change one side):
  *   - tokens: maximal runs of non-\s chars (Java \s = [ \t\n\x0B\f\r])
  *   - grams: n consecutive tokens joined by ' ', DISTINCT as strings
  *   - gram hash: fold (h*131 + codepoint) mod 1e9+7 over the gram's
  *     CODEPOINTS (astral-plane true, same contract as q98)
  *   - stream i: (h * a(i) + b(i)) mod P with the constants below
  */
object PortableHashKernels {
  val P = 1000000007L

  /** i-th universal-hash multiplier (Knuth 2654435761, never 0 mod P). */
  def a(i: Int): Long = {
    val v = (2654435761L * (i + 1)) % P
    if (v == 0L) 1L else v
  }

  /** i-th universal-hash offset. */
  def b(i: Int): Long = (40503L * (2L * i + 1)) % P

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || (c >= 0x09 && c <= 0x0D)

  /** Distinct gram hashes in first-occurrence order; empty array when the
    * doc has fewer than n tokens. Distinctness is by gram STRING (not by
    * hash value): a mod-P collision between two distinct grams must still
    * contribute two SimHash votes, exactly as the oracle's
    * list_distinct-then-hash does.
    */
  def gramHashArray(str: String, n: Int): Array[Long] = {
    val len = str.length
    var spans = new Array[Int](32)
    var nTok = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(str.charAt(i))) i += 1
      if (i < len) {
        val s0 = i
        while (i < len && !isWs(str.charAt(i))) i += 1
        if (nTok * 2 + 2 > spans.length) spans = java.util.Arrays.copyOf(spans, spans.length * 2)
        spans(nTok * 2) = s0
        spans(nTok * 2 + 1) = i
        nTok += 1
      }
    }
    if (nTok < n) return Array.emptyLongArray
    val seen = new java.util.HashSet[String]()
    val out = new Array[Long](nTok - n + 1)
    var m = 0
    val sb = new java.lang.StringBuilder
    var t = 0
    while (t + n <= nTok) {
      sb.setLength(0)
      var j = t
      while (j < t + n) {
        if (j > t) sb.append(' ')
        sb.append(str, spans(j * 2), spans(j * 2 + 1))
        j += 1
      }
      val gram = sb.toString
      if (seen.add(gram)) {
        var h = 0L
        var ci = 0
        val gl = gram.length
        while (ci < gl) {
          val cp = gram.codePointAt(ci)
          h = (h * 131L + cp) % P
          ci += Character.charCount(cp)
        }
        out(m) = h
        m += 1
      }
      t += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  /** k portable minhash minima; slots of a gram-less doc stay at the
    * sentinel P (every real value is < P) — callers map P to NULL to
    * match the oracle's CASE.
    */
  def minhashSig(s: UTF8String, n: Int, k: Int): ArrayData = {
    val hs = gramHashArray(s.toString, n)
    val as = Array.tabulate(k)(a)
    val bs = Array.tabulate(k)(b)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P)
    var gi = 0
    while (gi < hs.length) {
      val h = hs(gi)
      var i = 0
      while (i < k) {
        val v = (h * as(i) + bs(i)) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      gi += 1
    }
    new GenericArrayData(sig)
  }

  /** (n_grams, fp): fp bit t is the strict majority vote of bit t across
    * the distinct gram hashes; gram-less docs get (0, 0L).
    */
  def simhash(s: UTF8String, n: Int, bits: Int): InternalRow = {
    val hs = gramHashArray(s.toString, n)
    val votes = new Array[Int](bits)
    var gi = 0
    while (gi < hs.length) {
      val h = hs(gi)
      var t = 0
      while (t < bits) {
        if (((h >>> t) & 1L) == 1L) votes(t) += 1 else votes(t) -= 1
        t += 1
      }
      gi += 1
    }
    var fp = 0L
    var t = 0
    while (t < bits) {
      if (votes(t) > 0) fp |= 1L << t
      t += 1
    }
    new GenericInternalRow(Array[Any](hs.length, fp))
  }

  /** Whole-string portable codepoint hash — the same fold
    * (h·131 + codepoint) mod P the gram family uses, over the ENTIRE
    * string. Semantics identical to the HOF spec
    * `TextFunctions.portableStringHash` (differentially pinned by
    * `HashFunctionsSpec`); exists because the HOF form is
    * CodegenFallback and drags any projection containing it out of
    * whole-stage codegen — fatal when the hash sits in a fact-table
    * scan stage (q244's 11-way stats explode). */
  def cpHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      h = (h * 131L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Hashed linear classifier constants (the classic public LCG pair —
    * any engine can type them in). Distinct from the MinHash stream
    * constants so the two families can't be conflated. */
  val ClsA = 1103515245L
  val ClsB = 12345L

  /** fastText-style hashed bag-of-words linear scorer, fused: one pass
    * over the text, per TOKEN (bag semantics — every occurrence votes,
    * unlike the gram family's DISTINCT) fold the portable codepoint
    * hash, map it to an integer weight in [-1000, 1000] via
    * ((h·ClsA + ClsB) mod P) mod 2001 − 1000, and sum. Returns
    * struct<n_tok:bigint, score:bigint>. Every intermediate is
    * non-negative before its mod and bounded by P·ClsA ≈ 1.1e18, so
    * Java `%` ≡ SQL `%` and nothing wraps — the DuckDB oracle replays
    * the exact integers. A "trained" linear model would ship real
    * weights; the hash-derived weights exercise the identical plan
    * (hash → lookup → sum) with a portable stand-in.
    */
  def classifierScore(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = str.length
    var nTok = 0L
    var score = 0L
    var i = 0
    while (i < len) {
      while (i < len && isWs(str.charAt(i))) i += 1
      if (i < len) {
        var h = 0L
        while (i < len && !isWs(str.charAt(i))) {
          val cp = str.codePointAt(i)
          h = (h * 131L + cp) % P
          i += Character.charCount(cp)
        }
        nTok += 1L
        score += ((h * ClsA + ClsB) % P) % 2001L - 1000L
      }
    }
    new GenericInternalRow(Array[Any](nTok, score))
  }
}

abstract class PortableTextExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
}

/** Codegen'd whole-string portable codepoint hash
  * (see [[PortableHashKernels.cpHash]]). */
case class PortableCpHash(child: Expression) extends PortableTextExpression {
  override def prettyName: String = "portable_cp_hash"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PortableHashKernels.cpHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PortableHashKernels.cpHash($v);")

  override protected def withNewChildInternal(newChild: Expression): PortableCpHash =
    copy(child = newChild)
}

/** Fused portable MinHash signature (see [[PortableHashKernels.minhashSig]]). */
case class PortableMinHashSig(child: Expression, n: Int, k: Int)
    extends PortableTextExpression {
  require(n > 0 && n <= 64 && k > 0 && k <= 4096)
  override def prettyName: String = "portable_minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PortableHashKernels.minhashSig(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PortableHashKernels.minhashSig($v, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): PortableMinHashSig =
    copy(child = newChild)
}

/** Fused portable SimHash → struct<n_grams:int, fp:bigint>
  * (see [[PortableHashKernels.simhash]]). */
case class PortableSimHash(child: Expression, n: Int, bits: Int)
    extends PortableTextExpression {
  require(n > 0 && n <= 64 && bits > 0 && bits <= 30) // < 30 hash bits are unbiased-ish
  override def prettyName: String = "portable_simhash"
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    PortableHashKernels.simhash(input.asInstanceOf[UTF8String], n, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PortableHashKernels.simhash($v, $n, $bits);")

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash =
    copy(child = newChild)
}

/** Fused hashed-linear-classifier score → struct<n_tok:bigint,
  * score:bigint> (see [[PortableHashKernels.classifierScore]]). */
case class PortableClassifierScore(child: Expression)
    extends PortableTextExpression {
  override def prettyName: String = "classifier_score"
  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("score", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    PortableHashKernels.classifierScore(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PortableHashKernels.classifierScore($v);")

  override protected def withNewChildInternal(newChild: Expression): PortableClassifierScore =
    copy(child = newChild)
}
