package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Shared physical-plan predicates for the bucketed-artifact contract —
  * ONE definition consumed by PlanCheck and the artifact specs, so a
  * future strengthening (e.g. also rejecting a Sort above single-file
  * buckets, or unwrapping AQE query stages) cannot silently apply to
  * one copy and not the others.
  */
object PlanAudit {

  /** `side` reads a bucketed table and has no shuffle below it — the
    * read-back shape ArtifactStore.bucketed promises for joins on the
    * bucket keys. */
  def bucketedExchangeFreeSide(side: SparkPlan): Boolean =
    side.collectFirst {
      case sc: FileSourceScanExec if sc.relation.bucketSpec.isDefined => sc
    }.isDefined &&
      side.collect { case e: ShuffleExchangeExec => e }.isEmpty

  /** SOME SortMergeJoin in the plan has a bucketed exchange-free side
    * (the positive assertion: the artifact join exists and is laid out
    * right). */
  def hasBucketedSmj(p: SparkPlan): Boolean =
    p.collect { case j: SortMergeJoinExec => j }
      .exists(j => Seq(j.left, j.right).exists(bucketedExchangeFreeSide))

  /** EVERY SortMergeJoin in the plan has a bucketed exchange-free side
    * (the negative guard: no OTHER, shuffle-requiring sort-merge join
    * crept into a plan where only the artifact self-join is sanctioned). */
  def allSmjBucketed(p: SparkPlan): Boolean =
    p.collect { case j: SortMergeJoinExec => j }
      .forall(j => Seq(j.left, j.right).exists(bucketedExchangeFreeSide))
}
