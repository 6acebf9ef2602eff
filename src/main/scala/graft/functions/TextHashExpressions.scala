package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared imperative kernels for the text-hash expressions. Called from
  * both interpreted eval and the generated code (one static call per row
  * keeps whole-stage codegen intact while the per-shingle loop runs as
  * plain JIT-compiled Java).
  *
  * MinHash uses the two-hash trick (Kirsch–Mitzenmacher) plus a
  * splitmix64 finalizer: per shingle, two XXH64 passes over the bytes,
  * then the i-th "permutation" is mix64(h1 + i*h2) — O(bytes + k) per
  * shingle instead of O(bytes·k). The finalizer is load-bearing: without
  * it, min(h1 + i*h2) for large i is always won by the shingle with the
  * smallest h2 (the slope dominates), so slots correlate and estimated
  * Jaccard inflates wildly. The avalanche makes each slot's winner
  * pseudo-independent. This is what makes a 64-permutation signature
  * affordable on 100-TB corpora: ~2 byte-hashes + 64 integer mixes per
  * shingle, fully scan-local.
  */
object TextHashKernels {

  /** splitmix64 finalizer — full avalanche in 6 integer ops. */
  @inline private def mix64(v: Long): Long = {
    var z = v
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, h1)
        var h = h1
        var j = 0
        while (j < k) {
          val v = mix64(h)
          if (v < sig(j)) sig(j) = v
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Same vote semantics as the HOF formulation (xxhash64 seed 42 per
    * token; bit set iff strictly more 1-votes than 0-votes). */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 0x09 && b <= 0x0D)

  /** Token byte-ranges (start, endExclusive) of maximal non-whitespace
    * runs. ASCII whitespace only (regex \s); UTF-8 continuation bytes are
    * >= 0x80 so multi-byte characters can never be mistaken for it.
    */
  private def tokenSpans(base: AnyRef, off: Long, len: Int): (Array[Int], Int) = {
    var spans = new Array[Int](32)
    var nTok = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
        if (nTok * 2 + 2 > spans.length) spans = java.util.Arrays.copyOf(spans, spans.length * 2)
        spans(nTok * 2) = start
        spans(nTok * 2 + 1) = i
        nTok += 1
      }
    }
    (spans, nTok)
  }

  /** Copy the space-joined n-gram window [t, t+n) into `scratch` (grown as
    * needed); returns (buffer, byteLength). Identical bytes to
    * concat_ws(" ", tokens) — the canonical gram encoding both the string
    * and hashed paths share.
    */
  private def gramBytes(base: AnyRef, off: Long, spans: Array[Int], t: Int, n: Int,
      scratch: Array[Byte]): (Array[Byte], Int) = {
    var need = n - 1
    var j = t
    while (j < t + n) { need += spans(j * 2 + 1) - spans(j * 2); j += 1 }
    val buf = if (scratch.length >= need) scratch
      else new Array[Byte](math.max(need, scratch.length * 2))
    var pos = 0
    j = t
    while (j < t + n) {
      if (j > t) { buf(pos) = ' '; pos += 1 }
      val s = spans(j * 2); val e = spans(j * 2 + 1)
      org.apache.spark.unsafe.Platform.copyMemory(base, off + s, buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos, e - s)
      pos += e - s
      j += 1
    }
    (buf, pos)
  }

  /** Fused tokenize + word-n-gram + MinHash over raw text: one pass to
    * find token spans, then per window the space-joined gram bytes are
    * assembled in a REUSED scratch buffer, hashed (two XXH64 passes), and
    * folded into the k slots via KM+mix64. Hashes exactly the bytes
    * `wordNgrams` would materialize, so
    * minhash_text(t, n, k) ≡ minhash_sig(word_ngrams(t, n), k)
    * — the equivalence the [[graft.FuseMinHashRule]] fusion rule relies
    * on (and a differential test asserts). Documents with fewer than n
    * tokens get the all-Long.MaxValue sentinel.
    */
  def minhashText(s: org.apache.spark.unsafe.types.UTF8String, n: Int, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (spans, nTok) = tokenSpans(base, off, s.numBytes)
    var scratch = new Array[Byte](256)
    var t = 0
    while (t + n <= nTok) {
      val (buf, blen) = gramBytes(base, off, spans, t, n, scratch)
      scratch = buf
      val h1 = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, blen, 42L)
      val h2 = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, blen, h1)
      var h = h1
      var q = 0
      while (q < k) {
        val v = mix64(h)
        if (v < sig(q)) sig(q) = v
        h += h2
        q += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  /** Fused per-document text statistics — ONE byte pass replacing the
    * three regex executions q41 used to pay per row (`regexp_replace`
    * even materialized a filtered copy of the text just to measure it):
    *
    *  - alpha    = chars matching `[A-Za-z ]`
    *               (== `length(regexp_replace(text, "[^A-Za-z ]", ""))`)
    *  - n_tokens = maximal non-`\s` runs (== `regexp_count(text, "\S+")`)
    *  - n_bpeish = maximal same-class runs over {letter, digit, other}
    *               (== `regexp_count(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")`
    *               — the alternation matches exactly one maximal
    *               class-run per attempt, so counting run starts is
    *               equivalent)
    *
    * UTF-8 safe without decoding: every class test is ASCII-only, and
    * bytes >= 0x80 (negative as signed Byte — they fail every ASCII
    * range check) fall into the `other` class, so a multi-byte char's
    * lead+continuation bytes merge into the surrounding `other` run
    * exactly as the regex's `[^A-Za-z0-9\s]+` merges the chars.
    * `\s` here is Java regex `\s` = `[ \t\n\x0B\f\r]`, all ASCII.
    */
  def textStats(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var alpha = 0
    var nTok = 0
    var nBp = 0
    var prev = 0 // 0 = whitespace, 1 = letter, 2 = digit, 3 = other
    var i = 0
    while (i < len) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      val cls =
        if (b == ' ' || (b >= 0x09 && b <= 0x0D)) 0
        else if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) 1
        else if (b >= '0' && b <= '9') 2
        else 3
      if (cls == 1 || b == ' ') alpha += 1
      if (cls != 0) {
        if (prev == 0) nTok += 1
        if (cls != prev) nBp += 1
      }
      prev = cls
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](alpha, nTok, nBp))
  }

  /** Word n-gram strings (space-joined), native: one span scan + one
    * exact-size copy per gram — no per-element lambda frames, no slice
    * arrays, no concat_ws trees. Byte-identical output to the HOF
    * formulation (differential-tested).
    */
  def wordNgrams(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (spans, nTok) = tokenSpans(base, off, s.numBytes)
    if (nTok < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](nTok - n + 1)
    var t = 0
    while (t + n <= nTok) {
      // empty scratch -> gramBytes allocates exactly the gram's size, so
      // the buffer can be handed to UTF8String without copying; sharing
      // gramBytes keeps the gram encoding identical to the hashed path
      val (buf, blen) = gramBytes(base, off, spans, t, n, Array.emptyByteArray)
      out(t) = org.apache.spark.unsafe.types.UTF8String.fromBytes(buf, 0, blen)
      t += 1
    }
    new GenericArrayData(out)
  }
}

abstract class TextHashExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
}

/** k-permutation MinHash signature, native kernel (see [[TextHashKernels]]).
  * Empty input → all-Long.MaxValue sentinel, matching the HOF version. */
case class MinHashSig(child: Expression, k: Int) extends TextHashExpression {
  require(k > 0 && k <= 4096, s"unreasonable k=$k")
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextHashKernels.minhashSig($v, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Fused text → word-n-gram MinHash signature (see
  * [[TextHashKernels.minhashText]]). */
case class MinHashText(child: Expression, n: Int, k: Int) extends UnaryExpression {
  require(n > 0 && n <= 64 && k > 0 && k <= 4096)
  override def prettyName: String = "minhash_text"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.minhashText(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextHashKernels.minhashText($v, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashText =
    copy(child = newChild)
}

/** Native word-n-gram expression (see [[TextHashKernels.wordNgrams]]). */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0 && n <= 64)
  override def prettyName: String = "word_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.wordNgrams(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextHashKernels.wordNgrams($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** Fused per-document text statistics (see [[TextHashKernels.textStats]]):
  * struct<alpha:int, n_tokens:int, n_bpeish:int> in one byte pass.
  * Field dtypes mirror the regex formulations they replace
  * (`length`/`regexp_count` are IntegerType), so consumers and oracles
  * see identical schemas. */
case class TextStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "text_stats"
  override def dataType: DataType = TextStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.textStats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextHashKernels.textStats($v);")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("alpha", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_bpeish", IntegerType, nullable = false)))
}

/** 64-bit SimHash, native kernel — bit-identical to the HOF formulation. */
case class SimHash64(child: Expression) extends TextHashExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextHashKernels.simhash64($v);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
