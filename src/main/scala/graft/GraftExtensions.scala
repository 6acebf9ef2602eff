package graft

import graft.functions.{VecCosine, VecDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension installing the engine's native expressions into the
  * function registry at session build time, so pure-SQL users can call
  * them: set `spark.sql.extensions=graft.GraftExtensions` (GraftSession
  * does). Column-API callers go through VecExpressions.cosineFast, which
  * self-registers and works in any session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      exprs => VecDot(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      exprs => VecCosine(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_lsh_buckets"),
      new ExpressionInfo(classOf[graft.functions.VecLshBuckets].getName, "vec_lsh_buckets"),
      exprs => graft.functions.VecLshBuckets(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue,
        exprs(2).eval().asInstanceOf[Number].intValue)))
    // text-hash functions share one builder table with the Column-API
    // registration path (HashFunctions.sqlBuilders) so they can't drift
    graft.functions.HashFunctions.sqlBuilders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.TextHashExpressions", name), builder))
    }
    // sig(ngram()) -> fused single-pass kernel; see FuseMinHashRule
    ext.injectOptimizerRule(_ => graft.plans.FuseMinHashRule)
  }
}
