package graft.streaming

import java.sql.Timestamp

import graft.multimodal.Media
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming multimodal near-duplicate detection — the ingest-time form
  * of the batch media pHash dedup (q177): flag each arriving media item
  * against what already streamed in, without holding the corpus, using
  * the SAME [[Media.dhash63]] fingerprint and 16-bit-block pigeonhole as
  * the batch path (shared kernel, so streamed and batch fingerprints are
  * identical by construction).
  *
  * Machinery mirrors [[DocStreams.nearDupCandidates]] (admit-first
  * bucket owners, event-time eviction, expired-owner handling); the
  * differences are the key space (4 16-bit blocks of a 63-bit
  * fingerprint instead of 16 MinHash bands) and the verify measure
  * (Hamming distance instead of signature agreement). Unlike DocStreams
  * — which emits every bucket collision and lets the consumer threshold
  * est_jaccard — this emits only collisions within `maxHamming`: the
  * batch query applies exactly that cut in its verify stage, so the
  * streamed emissions stay a subset of q177's pair set (spec-pinned).
  *
  * Scale: the only shuffle is the groupByKey on the (block, value) key;
  * state is one owner per occupied bucket — 24 bytes (id, ts, fp),
  * literally — evicted by event-time timeout past owner.ts + horizon.
  * Content bytes never leave the scan-side flatMap: only the 8-byte
  * fingerprint rides the 4 block claims.
  */
object MediaStreams {

  final case class MediaMsg(media_id: Long, ts: Timestamp, content: Array[Byte])
  final case class BlockClaim(media_id: Long, ts: Timestamp, blk: Int, v: Long, fp: Long)
  final case class BlockOwner(media_id: Long, ts: Timestamp, fp: Long)
  final case class PhashDup(media_id: Long, dup_of: Long, hamming: Int, ts: Timestamp)

  // q177's own constants — shared so the streamed flags stay a subset of
  // the batch pair set by construction, not by parallel-edit discipline
  private val Blocks = graft.operators.MultimodalQueries.PhashBlocks

  /** media: (media_id LONG, ts TIMESTAMP, content BINARY), batch or
    * streaming. Same batch-degeneration contract as DocStreams: without
    * a watermark the timeouts are inert and admit-first applies over
    * each bucket's full history.
    */
  def phashNearDups(
      media: DataFrame,
      maxHamming: Int = graft.operators.MultimodalQueries.PhashMaxHamming,
      watermark: String = "1 hour",
      horizonSeconds: Long = 3600L): Dataset[PhashDup] = {
    import media.sparkSession.implicits._
    val claims = media.as[MediaMsg]
      .flatMap { m =>
        val fp = Media.dhash63(m.content)
        (0 until Blocks).map(b =>
          BlockClaim(m.media_id, m.ts, b, (fp >>> (16 * b)) & 0xFFFFL, fp))
      }
      // watermark AFTER the typed flatMap: event-time metadata does not
      // survive object serialization boundaries, so marking `ts` here is
      // what makes the timeout/eviction machinery live
      .withWatermark("ts", watermark)

    claims.groupByKey(c => (c.blk, c.v))
      .flatMapGroupsWithState[BlockOwner, PhashDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[BlockClaim], state: GroupState[BlockOwner]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = try state.getCurrentWatermarkMs()
              catch { case _: UnsupportedOperationException => Long.MinValue }
            // expire an aged-out owner in the data path (DocStreams'
            // lesson: data is processed before timeouts fire, and
            // re-registering a past-watermark deadline kills the query)
            var owner = state.getOption.filter(o =>
              wm == Long.MinValue || o.ts.getTime + horizonSeconds * 1000 > wm)
            if (owner.isEmpty && state.exists) state.remove()
            val sorted = rows.toSeq.sortBy(c => (c.ts.getTime, c.media_id))
            val out = Seq.newBuilder[PhashDup]
            sorted.foreach { c =>
              owner match {
                case None =>
                  owner = Some(BlockOwner(c.media_id, c.ts, c.fp))
                case Some(o) if o.media_id != c.media_id =>
                  val h = java.lang.Long.bitCount(o.fp ^ c.fp)
                  if (h <= maxHamming) out += PhashDup(c.media_id, o.media_id, h, c.ts)
                case Some(_) => () // same item re-delivered in the trigger
              }
            }
            owner.foreach { o =>
              state.update(o)
              val deadline = o.ts.getTime + horizonSeconds * 1000
              try state.setTimeoutTimestamp(
                if (wm == Long.MinValue) deadline else math.max(deadline, wm + 1))
              catch { case _: UnsupportedOperationException => () }
            }
            out.result().iterator
          }
      }
  }

  final case class LmRow(media_id: Long, ts: Timestamp, n_landmarks: Long,
      lm: Option[Long], known: Option[Int])
  final case class LandmarkVerdict(media_id: Long, n_landmarks: Long,
      n_matched: Long, containment_ppm: Long, flagged: Boolean, ts: Timestamp)

  /** Streaming AUDIO LANDMARK gate — the ingest-time form of q229's
    * matching, in the stream-vs-stored-index shape of
    * [[DocStreams.incrementalAdmission]]: each ARRIVING audio item's
    * constellation landmarks ([[Media.audioLandmarks]], the Scala twin
    * of q229's chain — per-item set agreement spec-pinned) are checked
    * against the STORED landmark inventory via ONE stateless
    * stream-static left-outer join; the per-item verdict folds with
    * ZERO state (NoTimeout — an item's landmark rows all land in its
    * arrival trigger). containment_ppm = matched/own landmarks, q229's
    * dup signal; flagged at ≥ [[MultimodalQueries.AudioMinShared]]
    * matches. Landmark-less items (short signals) flow through
    * unflagged — the DocStreams degenerate convention.
    *
    * Scale: the arriving micro-batch is the only moving data; the join
    * key is one 8-byte landmark code per distinct landmark, content
    * bytes never leave the scan-side flatMap, and state is zero. */
  def landmarkGate(
      media: DataFrame,
      idxLandmarks: DataFrame, // (lm) — DISTINCT stored landmark codes
      watermark: String = "1 hour"): Dataset[LandmarkVerdict] = {
    import media.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    // primitives captured locally: closing over the MultimodalQueries
    // module would drag its QueryDef graph into the task closure
    // (observed as Task not serializable)
    val mq = graft.operators.MultimodalQueries
    val (lw, lhop, lgap, minShared) =
      (mq.AudioW, mq.AudioHop, mq.AudioGap, mq.AudioMinShared)
    val rows = media.as[MediaMsg]
      .flatMap { m =>
        val lms = Media.audioLandmarks(m.content, lw, lhop, lgap)
        if (lms.isEmpty) Seq((m.media_id, m.ts, 0L, Option.empty[Long]))
        else lms.toSeq.map(l => (m.media_id, m.ts, lms.length.toLong, Some(l)))
      }
      .toDF("media_id", "ts", "n_landmarks", "lm")
      .withWatermark("ts", watermark)
      .join(idxLandmarks.select(col("lm"), lit(1).as("known")),
        Seq("lm"), "left_outer")
      .select(col("media_id"), col("ts"), col("n_landmarks"), col("lm"),
        col("known"))
      .as[LmRow]
    rows.groupByKey(_.media_id)
      .flatMapGroupsWithState[Boolean, LandmarkVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, it: Iterator[LmRow], _: GroupState[Boolean]) =>
          val rs = it.toSeq
          val n = rs.head.n_landmarks
          val matched = rs.count(r => r.lm.isDefined && r.known.isDefined).toLong
          val ts = rs.map(_.ts).maxBy(_.getTime)
          val ppm = if (n > 0) 1000000L * matched / n else 0L
          Iterator.single(LandmarkVerdict(id, n, matched, ppm,
            flagged = matched >= minShared, ts))
      }
  }
}
