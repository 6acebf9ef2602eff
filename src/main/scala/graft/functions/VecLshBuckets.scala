package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Multi-table sign-random-projection LSH buckets, as one fused codegen
  * loop: `tables` independent hash tables of `bits` hyperplanes each.
  * Hyperplane weights are deterministic ±1 from an integer mix of
  * (table, bit, dim) — no stored projection matrix, reproducible across
  * executors and engines.
  *
  * Output: array<long> of length `tables`; element t is the t-th table's
  * bucket id namespaced with the table index (bucket | t << bits), so a
  * plain explode+equi-join on the value probes all tables at once. The
  * OR over tables is what buys recall for weak neighbors — a single
  * m-bit table recalls p^m of pairs, L tables recall 1-(1-p^m)^L, while
  * the shuffle still carries only (id, 8-byte key) pairs.
  */
case class VecLshBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  require(tables > 0 && bits > 0 && bits < 32 && tables * (1L << bits) < (1L << 62))

  override def prettyName: String = "vec_lsh_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** ±1 weight for (table, bit, dim): splitmix-style integer mix. */
  @inline private def sign(t: Int, j: Int, i: Int): Double = {
    var h = t * 0x9E3779B1 + j * 0x85EBCA6B + i * 0xC2B2AE35
    h ^= h >>> 16; h *= 0x7FEB352D; h ^= h >>> 15
    if ((h & 1) == 0) 1.0 else -1.0
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        var dot = 0.0; var i = 0
        while (i < n) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          dot += sign(t, j, i) * x; i += 1
        }
        bucket = (bucket << 1) | (if (dot >= 0) 1L else 0L); j += 1
      }
      out(t) = bucket | (t.toLong << bits); t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val getter = if (isFloat) "getFloat" else "getDouble"
      s"""
         |int $n = $v.numElements();
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      int $h = $t * 0x9E3779B1 + $j * 0x85EBCA6B + $i * 0xC2B2AE35;
         |      $h ^= $h >>> 16; $h *= 0x7FEB352D; $h ^= $h >>> 15;
         |      double w = (($h & 1) == 0) ? 1.0 : -1.0;
         |      $dot += w * (double) $v.$getter($i);
         |    }
         |    $bucket = ($bucket << 1) | (($dot >= 0) ? 1L : 0L);
         |  }
         |  $out[$t] = $bucket | (((long) $t) << $bits);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecLshBuckets =
    copy(child = newChild)
}
