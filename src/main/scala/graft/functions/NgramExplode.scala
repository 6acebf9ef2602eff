package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Generator (UDTF-class) expression: one output row per word n-gram of
  * the input text — `LATERAL VIEW ngram_explode(text, n) g AS pos, gram`.
  *
  * The §2.9 Generator slot of the extension surface. Equivalent to
  * `posexplode(word_ngrams(text, n))` but emits rows straight off the
  * shared byte-scanning kernel; either way the generate stays in the scan
  * stage — corpus-wide gram statistics shuffle only (gram, partial count)
  * pairs after the generate+partial-agg.
  */
case class NgramExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n > 0 && n <= 64)
  override def prettyName: String = "ngram_explode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val grams = TextHashKernels.wordNgrams(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
      (0 until grams.numElements()).map(i =>
        InternalRow(i, grams.getUTF8String(i)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NgramExplode =
    copy(child = newChild)
}
