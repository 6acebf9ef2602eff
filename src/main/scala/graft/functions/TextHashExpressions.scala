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

  /** Fused tokenize + word-n-gram + MinHash over raw text: ONE pass over
    * the UTF-8 bytes. Tokens are maximal non-whitespace byte runs hashed
    * in place (no token strings, no n-gram strings, no arrays); an n-slot
    * ring of token hashes yields each window's chained hash, which feeds
    * the same KM+mix64 slot update as [[minhashSig]]. Documents with
    * fewer than n tokens get the sentinel signature — same contract as
    * minhash_sig(word_ngrams(text, n), k).
    */
  def minhashText(s: org.apache.spark.unsafe.types.UTF8String, n: Int, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    val ring = new Array[Long](n)
    var tokCount = 0
    var i = 0
    while (i < len) {
      var b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      // ASCII whitespace (regex \s); UTF-8 continuation bytes are >= 0x80
      // so multi-byte characters can never be mistaken for it
      while (i < len && (b == ' ' || (b >= 0x09 && b <= 0x0D))) {
        i += 1
        if (i < len) b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      }
      if (i < len) {
        val start = i
        while (i < len && !(b == ' ' || (b >= 0x09 && b <= 0x0D))) {
          i += 1
          if (i < len) b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
        }
        ring(tokCount % n) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        tokCount += 1
        if (tokCount >= n) {
          var c = 42L
          var j = tokCount - n
          while (j < tokCount) { c = XXH64.hashLong(ring(j % n), c); j += 1 }
          val h2 = XXH64.hashLong(c, 0x9E3779B97F4A7C15L)
          var h = c
          var q = 0
          while (q < k) {
            val v = mix64(h)
            if (v < sig(q)) sig(q) = v
            h += h2
            q += 1
          }
        }
      }
    }
    new GenericArrayData(sig)
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
