package graft.plans

import graft.functions.{MinHashSig, MinHashText, WordNgrams}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: fuse `minhash_sig(word_ngrams(text, n), k)` into the
  * single-pass `minhash_text(text, n, k)` kernel — the composed form
  * materializes every n-gram string as an array element only to hash it
  * and throw it away; the fused expression assembles each gram in a
  * reused scratch buffer instead.
  *
  * Semantics-preserving by construction: [[graft.functions.TextHashKernels
  * .minhashText]] hashes exactly the space-joined gram bytes that
  * [[graft.functions.TextHashKernels.wordNgrams]] materializes (a
  * differential test asserts signature equality). This is the engine's
  * `Rule[LogicalPlan]` surface — injected through
  * `SparkSessionExtensions.injectOptimizerRule` alongside the expression
  * and DSv2 registrations in [[graft.GraftExtensions]].
  */
object FuseMinHashRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case MinHashSig(WordNgrams(text, n), k) => MinHashText(text, n, k)
    }
}
