package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word under a unigram-LM piece vocabulary
  * — the apply/E-step kernel of the SentencePiece-style trainer
  * (`UnigramQueries`). One fused DP per row; the vocabulary arrives as
  * two aligned LITERAL arrays (pieces, fixed-point weights) because the
  * trained vocab is bounded side-data (the codebook pattern), and the
  * piece→weight hash map is memoized per thread keyed on the literal's
  * identity so the map is built once per task, not per row.
  *
  * Objective (exact integers end to end, so a DuckDB oracle replays it
  * with an unrolled position-DP): maximize Σ w(piece) where
  * w = llog(cnt+1) − llog(T+|V|) in 2⁻¹⁶ log₂ units (llog is the
  * piecewise-linear integer log2: (b<<16) + ((x−2^b)<<16)/2^b, all
  * shifts — [[UnigramSegment.llog]]). Ties resolve by the packed key
  * sc·2048 − np·64 + lastPieceLen (score, then fewer pieces, then the
  * longer last piece); the packing is collision-free because equal
  * (sc, np, lastLen) at one position implies the identical transition.
  * Pieces are capped at [[UnigramSegment.MaxPieceLen]] chars, so the
  * DP is O(len·4) with O(len) state.
  *
  * Returns the tab-joined piece sequence (words split on \s+ can never
  * contain a tab in either engine); null for a null word or an
  * unreachable position (impossible while every char of every word is
  * in the vocab — the trainer's coverage guarantee).
  */
case class UnigramSegment(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "unigram_segment"
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>, array<bigint>), " +
          s"got ${a.simpleString} / ${b.simpleString} / ${c.simpleString}")
    }

  override def nullSafeEval(w: Any, p: Any, wt: Any): Any =
    UnigramSegment.kernel(w.asInstanceOf[UTF8String],
      p.asInstanceOf[ArrayData], wt.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, p, wt) => s"""
       |${ev.value} = graft.functions.UnigramSegment.kernel($w, $p, $wt);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): UnigramSegment =
    copy(first = f, second = s, third = t)
}

object UnigramSegment {
  val MaxPieceLen = 4

  /** Piecewise-linear fixed-point log2 in 2⁻¹⁶ units: exact integer
    * shifts only, so DuckDB replays it verbatim
    * (`(b<<16) + CASE WHEN b>=16 THEN (x−2^b)>>(b−16) ELSE ((x−2^b)<<16)>>b END`
    * with b = length(printf('%b', x)) − 1). Monotone in x; exact at
    * powers of two (llog(2^k) = k·65536). Requires x ≥ 1. */
  def llog(x: Long): Long = {
    require(x >= 1, s"llog requires x >= 1, got $x")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val frac =
      if (b >= 16) (x - (1L << b)) >>> (b - 16)
      else ((x - (1L << b)) << 16) >>> b
    (b.toLong << 16) + frac
  }

  // per-thread memo of the piece→weight map, keyed on the literal
  // ArrayData instance (one per plan, shared across the task's rows).
  // Values are BOXED on purpose: a primitive-valued java.util.HashMap
  // silently unboxes get()'s null to 0L in Scala — weight 0 beats every
  // real (negative) weight, so every unknown substring would win the DP
  private val memo = new ThreadLocal[(AnyRef, java.util.HashMap[String, java.lang.Long])]

  private def vocabMap(pieces: ArrayData, weights: ArrayData)
      : java.util.HashMap[String, java.lang.Long] = {
    val cached = memo.get()
    if (cached != null && (cached._1 eq pieces)) cached._2
    else {
      val m = new java.util.HashMap[String, java.lang.Long](pieces.numElements() * 2)
      var i = 0
      while (i < pieces.numElements()) {
        m.put(pieces.getUTF8String(i).toString, weights.getLong(i))
        i += 1
      }
      memo.set((pieces, m))
      m
    }
  }

  def kernel(word: UTF8String, pieces: ArrayData, weights: ArrayData): UTF8String = {
    val m = vocabMap(pieces, weights)
    val s = word.toString
    val n = s.length
    if (n == 0) return UTF8String.EMPTY_UTF8
    val sc = new Array[Long](n + 1)
    val np = new Array[Long](n + 1)
    val lastLen = new Array[Int](n + 1) // 0 = unreachable (start aside)
    lastLen(0) = -1 // start marker: reachable with no last piece
    var j = 1
    while (j <= n) {
      var bestPacked = Long.MinValue
      var bestL = 0
      var l = 1
      val lMax = math.min(MaxPieceLen, j)
      while (l <= lMax) {
        val i = j - l
        if (lastLen(i) != 0) {
          val w = m.get(s.substring(i, j))
          if (w != null) {
            val cSc = sc(i) + w
            val cNp = np(i) + 1
            val packed = cSc * 2048 - cNp * 64 + l
            if (packed > bestPacked) { bestPacked = packed; bestL = l }
          }
        }
        l += 1
      }
      if (bestL == 0) lastLen(j) = 0 // unreachable
      else {
        val i = j - bestL
        sc(j) = sc(i) + m.get(s.substring(i, j))
        np(j) = np(i) + 1
        lastLen(j) = bestL
      }
      j += 1
    }
    if (lastLen(n) == 0) return null // vocab lacks a char — coverage broken
    // backtrack
    val parts = new scala.collection.mutable.ArrayBuffer[String](np(n).toInt)
    var pos = n
    while (pos > 0) {
      val l = lastLen(pos)
      parts += s.substring(pos - l, pos)
      pos -= l
    }
    UTF8String.fromString(parts.reverseIterator.mkString("\t"))
  }
}
