package graft

import graft.operators.DedupQueries
import graft.sources.ArtifactStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full day-over-day lifecycle of the stored dedup band index that
  * q148 queries one round of: build the index from the existing corpus,
  * admit a new batch against it, APPEND the admitted batch's band rows
  * (ArtifactStore.append — bucket layout preserved, nothing re-shuffled),
  * and verify the NEXT day's batch is checked against the grown index —
  * with candidate sets bit-identical to recomputing everything from raw
  * text. This is the operational contract the q148 scaladoc claims;
  * here it runs end to end.
  */
class IncrementalIndexLifecycleSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def bandrowsOf(docs: DataFrame): DataFrame = {
    val sig = docs.select(col("doc_id") +: DedupQueries.portableMinhashCols(col("text")): _*)
    val digests = DedupQueries.portableBandDigests(i => col(s"mh$i"))
    sig.select(col("doc_id"),
        posexplode(array(digests: _*)).as(Seq("band", "digest")))
      .filter(col("digest").isNotNull)
      .select(col("band"), col("digest"), col("doc_id"))
  }

  private def candidates(batch: DataFrame, index: DataFrame): Set[(Long, Long)] =
    batch.select(col("band"), col("digest"), col("doc_id").as("new_id"))
      .join(index.select(col("band"), col("digest"), col("doc_id").as("idx_id")),
        Seq("band", "digest"))
      .select("new_id", "idx_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("build -> admit -> append -> next batch sees the grown index, bit-identically") {
    val docs = Tables.documents(spark, d)
    val day0 = docs.filter(col("doc_id") < 300)
    val day1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val day2 = docs.filter(col("doc_id") >= 400)

    val key = s"lifecycle-${System.nanoTime}"
    val index = ArtifactStore.bucketed(spark, key, "spec_lifecycle",
      Seq("band", "digest"), 4)(bandrowsOf(day0))

    // day 1: admission against the stored index == against a fresh recompute
    val got1 = candidates(bandrowsOf(day1), index)
    val want1 = candidates(bandrowsOf(day1), bandrowsOf(day0))
    assert(got1 == want1)

    // admit day 1 (in this corpus every doc is admitted; the point is
    // the append): the index grows WITHOUT re-hashing or re-shuffling
    // the day-0 rows
    ArtifactStore.append(spark, key, "spec_lifecycle", bandrowsOf(day1))
    assert(index.count() ==
      bandrowsOf(docs.filter(col("doc_id") < 400)).count())

    // day 2: candidates against the grown stored index must equal a
    // from-scratch recompute over days 0+1 — append changed nothing
    // about content, only avoided the rework
    val got2 = candidates(bandrowsOf(day2), index)
    val want2 = candidates(bandrowsOf(day2),
      bandrowsOf(docs.filter(col("doc_id") < 400)))
    assert(got2 == want2)
    // and the day-1 appendees are genuinely visible as index docs:
    // unless day 2 collides with nothing at all from day 1's range,
    // some candidate partner must fall in [300, 400)
    val sawDay1 = got2.exists { case (_, idx) => idx >= 300 && idx < 400 }
    val possible = want2.exists { case (_, idx) => idx >= 300 && idx < 400 }
    assert(sawDay1 == possible)
  }
}
