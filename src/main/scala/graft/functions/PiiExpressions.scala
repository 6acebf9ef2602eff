package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII detection + redaction — ONE expression evaluation replacing
  * SIX regex executions per row (three `regexp_count` + three
  * `regexp_replace`), q41's TextStats lesson applied to the scrub pass.
  *
  * Semantics are EXACTLY the sequential three-pass regex formulation
  *
  *   email pass:  `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` → `[EMAIL]`
  *   ip pass:     `\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b`          → `[IP]`
  *   phone pass:  `\b\d{3}-\d{4}\b`                                 → `[PHONE]`
  *
  * each pass running over the PREVIOUS pass's output (leftmost,
  * non-overlapping, greedy-with-backtracking — the shared Java-regex /
  * RE2 semantics for these patterns), counts collected per pass. The
  * kernel reproduces each pattern's backtracking by hand: the email
  * domain backtrack is "rightmost dot followed by ≥2 letters inside the
  * maximal domain run"; the IP octets try lengths 3→1 with the trailing
  * word-boundary re-checked per choice; the phone pattern has fixed
  * widths and needs no backtracking. `\b` is the ASCII word boundary
  * ([A-Za-z0-9_]), identical in Java (over this corpus's ASCII text)
  * and RE2. A differential spec (PiiScrubSpec) pins kernel ==
  * regex-chain equality over adversarial fixtures AND the full corpus.
  */
object PiiKernels {

  @inline private def isWord(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '_'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  @inline private def isLocal(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  @inline private def isDomain(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '.' || c == '-'

  /** One email pass: (match count, text with matches → `[EMAIL]`). */
  def emailPass(s: String): (Int, String) = {
    val len = s.length
    val sb = new java.lang.StringBuilder(len)
    var count = 0
    var copied = 0 // s[0, copied) already emitted
    var lastEnd = 0 // no local part may reach into a previous match
    var j = 0
    while (j < len) {
      if (s.charAt(j) == '@') {
        var ls = j
        while (ls > lastEnd && isLocal(s.charAt(ls - 1))) ls -= 1
        if (ls < j) { // non-empty local part
          var m = j + 1
          while (m < len && isDomain(s.charAt(m))) m += 1
          // Java's greedy-domain backtrack lands on the RIGHTMOST '.'
          // (at ≥ j+2: the domain needs ≥1 char before it) followed by
          // ≥2 letters; the match ends after the maximal letter run
          var end = -1
          var p = m - 1
          while (end < 0 && p > j + 1) {
            if (s.charAt(p) == '.') {
              var q = p + 1
              while (q < m && isLetter(s.charAt(q))) q += 1
              if (q - p - 1 >= 2) end = q
            }
            p -= 1
          }
          if (end > 0) {
            sb.append(s, copied, ls).append("[EMAIL]")
            copied = end; lastEnd = end; count += 1
            j = end - 1 // loop increment moves to `end`
          }
        }
      }
      j += 1
    }
    sb.append(s, copied, len)
    (count, sb.toString)
  }

  /** End index of `\d{1,3}(\.\d{1,3}){3}\b` starting at `start`, or -1.
    * Octet lengths are tried greedily 3→1 with full backtracking —
    * bounded at 3^4 combinations, in practice far fewer. */
  private def matchIp(s: String, start: Int): Int = {
    val len = s.length
    def rec(p: Int, oct: Int): Int = {
      var avail = 0
      while (avail < 3 && p + avail < len && isDigit(s.charAt(p + avail))) avail += 1
      var l = avail
      while (l >= 1) {
        val q = p + l
        if (oct == 3) {
          if (q >= len || !isWord(s.charAt(q))) return q
        } else if (q < len && s.charAt(q) == '.') {
          val r = rec(q + 1, oct + 1)
          if (r > 0) return r
        }
        l -= 1
      }
      -1
    }
    rec(start, 0)
  }

  /** One IP pass: (match count, text with matches → `[IP]`). */
  def ipPass(s: String): (Int, String) = {
    val len = s.length
    val sb = new java.lang.StringBuilder(len)
    var count = 0
    var copied = 0
    var i = 0
    while (i < len) {
      if (isDigit(s.charAt(i)) && (i == 0 || !isWord(s.charAt(i - 1)))) {
        val end = matchIp(s, i)
        if (end > 0) {
          sb.append(s, copied, i).append("[IP]")
          copied = end; count += 1; i = end
        } else i += 1
      } else i += 1
    }
    sb.append(s, copied, len)
    (count, sb.toString)
  }

  /** One phone pass (`\b\d{3}-\d{4}\b`): fixed widths, no backtracking. */
  def phonePass(s: String): (Int, String) = {
    val len = s.length
    val sb = new java.lang.StringBuilder(len)
    var count = 0
    var copied = 0
    var i = 0
    while (i < len) {
      if (isDigit(s.charAt(i)) && (i == 0 || !isWord(s.charAt(i - 1))) &&
        i + 8 <= len &&
        isDigit(s.charAt(i + 1)) && isDigit(s.charAt(i + 2)) &&
        s.charAt(i + 3) == '-' &&
        isDigit(s.charAt(i + 4)) && isDigit(s.charAt(i + 5)) &&
        isDigit(s.charAt(i + 6)) && isDigit(s.charAt(i + 7)) &&
        (i + 8 == len || !isWord(s.charAt(i + 8)))) {
        sb.append(s, copied, i).append("[PHONE]")
        copied = i + 8; count += 1; i += 8
      } else i += 1
    }
    sb.append(s, copied, len)
    (count, sb.toString)
  }

  /** The fused scrub: email → ip → phone sequential passes, one struct.
    * Field order matches [[PiiScrub.schema]]. */
  def scrub(u: UTF8String): InternalRow = {
    val (ne, s1) = emailPass(u.toString)
    val (ni, s2) = ipPass(s1)
    val (np, s3) = phonePass(s2)
    new GenericInternalRow(Array[Any](ne, np, ni, UTF8String.fromString(s3)))
  }
}

/** Column-level fused PII scrub (see [[PiiKernels]]):
  * struct<n_emails:int, n_phones:int, n_ips:int, redacted:string>. */
case class PiiScrub(child: Expression) extends UnaryExpression {
  override def prettyName: String = "pii_scrub"
  override def dataType: DataType = PiiScrub.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PiiKernels.scrub(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PiiKernels.scrub($v);")

  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}

object PiiScrub {
  val schema: StructType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("n_ips", IntegerType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
}
