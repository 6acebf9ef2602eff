package graft.streaming

import java.sql.Timestamp

import graft.functions.HashFunctions._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-duplicate detection over a document feed —
  * the streaming form of the batch LSH dedup (q52/q56; ref for the batch
  * semantics: DedupQueries). This is the ingest-time shape a training-data
  * pipeline needs: flag each arriving document against what already
  * streamed in, without ever holding the corpus.
  *
  * Design:
  *   signature + band keys are computed scan-side by the same native
  *   expressions as the batch path (minhash_text / lsh bands — identical
  *   hash family, so streamed and batch signatures are comparable), then
  *   ONE stateful operator keyed by (band, bh) holds each bucket's
  *   admit-first owner: the earliest (ts, doc_id) document to claim the
  *   bucket within the horizon. A later document hitting an owned bucket
  *   emits a (doc, dup_of=owner, est_jaccard) candidate instead of
  *   claiming.
  *
  * Semantics notes:
  *   - Admit-first (FIFO): duplicates never become owners of buckets they
  *     collide on, so chains collapse toward the earliest document in the
  *     horizon — the streaming analog of q56's min-label convergence.
  *   - A pair colliding in several bands emits several candidate rows;
  *     consumers take the max-est_jaccard row per (doc_id, dup_of) (a
  *     per-microbatch distinct in foreachBatch, or just a downstream
  *     filter — the rows agree on est_jaccard since it comes from the
  *     full signatures, not the band).
  *   - Unverified candidates: like the batch path, LSH proposes and
  *     est_jaccard (signature agreement) disposes; callers filter on
  *     their threshold.
  *
  * Scale shape: the only shuffle is the groupByKey on the 12-byte bucket
  * key; state is one owner per occupied bucket (doc_id + k-slot
  * signature, ~0.5 KB at k=64) and is evicted by event-time timeout once
  * the watermark passes owner.ts + horizon — so state is
  * O(buckets occupied within the horizon), not O(stream history), and a
  * re-arriving text after the horizon simply re-claims its buckets.
  */
object DocStreams {

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)
  final case class Claim(doc_id: Long, ts: Timestamp, band: Int, bh: Long, sig: Seq[Long])
  final case class BucketOwner(doc_id: Long, ts: Timestamp, sig: Seq[Long])
  final case class NearDup(doc_id: Long, dup_of: Long, est_jaccard: Double, ts: Timestamp)

  /** Fraction of agreeing signature slots — the MinHash Jaccard estimate
    * (same definition as the SQL-side minhashJaccard helper). */
  private def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
    if (a.isEmpty || a.length != b.length) 0.0
    else a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.length

  /** docs: (doc_id LONG, ts TIMESTAMP, text STRING), batch or streaming.
    * In streaming, `withWatermark` is applied here (callers pass the
    * horizon); in batch execution timeouts are ignored and the operator
    * degenerates to admit-first over each bucket's full history — same
    * emission rule, tested both ways.
    */
  def nearDupCandidates(
      docs: DataFrame,
      ngram: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      watermark: String = "1 hour",
      horizonSeconds: Long = 3600L): Dataset[NearDup] = {
    import docs.sparkSession.implicits._
    val claims = docs
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        minhashTextSignature(col("text"), ngram, k).as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(lshBands(col("sig"), k, bands)).as("bk"))
      .select(col("doc_id"), col("ts"), col("bk.band").as("band"),
        col("bk.bh").as("bh"), col("sig"))
      .as[Claim]

    claims.groupByKey(c => (c.band, c.bh))
      .flatMapGroupsWithState[BucketOwner, NearDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[Claim], state: GroupState[BucketOwner]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed owner.ts + horizon: bucket forgets its owner
            state.remove()
            Iterator.empty
          } else {
            // batch execution has no watermark (getCurrentWatermarkMs and
            // setTimeoutTimestamp both reject) — Long.MinValue disables
            // the expiry paths there; admit-first over full history applies
            val wm = try state.getCurrentWatermarkMs()
              catch { case _: UnsupportedOperationException => Long.MinValue }
            // data is processed BEFORE timeouts fire within a trigger, so
            // a claim can arrive while an already-expired owner is still
            // in state; honoring it would flag against a forgotten doc,
            // and re-registering its timeout (<= watermark) would throw
            // and kill the query. Expire it here instead.
            var owner = state.getOption.filter(o =>
              wm == Long.MinValue || o.ts.getTime + horizonSeconds * 1000 > wm)
            if (owner.isEmpty && state.exists) state.remove()
            // deterministic within a trigger: earliest (ts, doc_id) first
            val sorted = rows.toSeq.sortBy(c => (c.ts.getTime, c.doc_id))
            val out = Seq.newBuilder[NearDup]
            sorted.foreach { c =>
              owner match {
                case None =>
                  owner = Some(BucketOwner(c.doc_id, c.ts, c.sig))
                case Some(o) if o.doc_id != c.doc_id =>
                  out += NearDup(c.doc_id, o.doc_id, estJaccard(o.sig, c.sig), c.ts)
                case Some(_) => () // same doc re-delivered in the trigger
              }
            }
            owner.foreach { o =>
              state.update(o)
              // clamp above the watermark: a surviving owner's nominal
              // deadline can still be <= wm only in edge interleavings,
              // and setTimeoutTimestamp rejects timestamps <= watermark
              val deadline = o.ts.getTime + horizonSeconds * 1000
              try state.setTimeoutTimestamp(
                if (wm == Long.MinValue) deadline else math.max(deadline, wm + 1))
              catch { case _: UnsupportedOperationException => () }
            }
            out.result().iterator
          }
      }
  }
}
