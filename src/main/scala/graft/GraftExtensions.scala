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
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      exprs => graft.functions.MinHashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      exprs => graft.functions.SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("minhash_text"),
      new ExpressionInfo(classOf[graft.functions.MinHashText].getName, "minhash_text"),
      exprs => graft.functions.MinHashText(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue,
        exprs(2).eval().asInstanceOf[Number].intValue)))
    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[graft.functions.WordNgrams].getName, "word_ngrams"),
      exprs => graft.functions.WordNgrams(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue)))
    // sig(ngram()) -> fused single-pass kernel; see FuseMinHashRule
    ext.injectOptimizerRule(_ => graft.plans.FuseMinHashRule)
  }
}
