package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SEMANTIC dedup over an embedding feed — the streaming form
  * of q170 (SemDeDup; ref for the batch semantics: SimilarityQueries):
  * flag each arriving vector against what already streamed into its
  * cluster, without ever holding the corpus.
  *
  * Design mirrors [[DocStreams]] (the text-side streaming dedup):
  *   - assignment to the trained coarse quantizer happens SCAN-SIDE in a
  *     typed map against the closure-captured codebook (IvfK rows — the
  *     streaming analog of the batch broadcast; in production this is
  *     `sparkContext.broadcast` of the stored `cent_ivf` artifact);
  *   - ONE stateful operator keyed by c_id holds the cluster's ADMITTED
  *     members within the horizon. An arriving vector with an admitted
  *     member at cosine ≥ the threshold emits a (vec, dup_of) candidate
  *     instead of admitting — admit-first, so duplicates never become
  *     members other vectors are compared against (chains collapse
  *     toward the earliest arrival, [[DocStreams]]' convention). NOTE
  *     this is deliberately NOT batch q170's rule: q170 drops a vector
  *     if ANY lower-id close partner exists, admitted or not, so on a
  *     transitive chain A~B, B~C, A≁C (id order = arrival order) q170
  *     drops both B and C while admit-first keeps C — the streaming
  *     semantics are the ingest-gate ones (compare against what the
  *     corpus actually admitted), and the spec's reference fold pins
  *     exactly that.
  *
  * The threshold decision is the SAME exact integer predicate as q170 —
  * over 1e-4-quantized coordinates, cos ≥ 7/20 ⟺ dot ≥ 0 ∧
  * (20·dot)² ≥ 49·n2a·n2b, evaluated in BigInt — so a vector pair gets
  * the same verdict streamed or batched, bit for bit.
  *
  * Scale shape: the only shuffle is the groupByKey on c_id; state is the
  * admitted members of each cluster within the horizon (64 longs + id +
  * ts each — the same Σ|cluster| bound as the batch pair stage's build
  * side), evicted per member once the watermark passes ts + horizon.
  */
object VecStreams {

  final case class Vec(vec_id: Long, ts: Timestamp, embedding: Seq[Float])
  final case class Assigned(vec_id: Long, ts: Timestamp, c_id: Int, qv: Array[Long])
  final case class Member(vec_id: Long, tsMs: Long, qv: Array[Long])
  final case class ClusterMembers(members: List[Member])
  final case class SemDup(vec_id: Long, dup_of: Long, c_id: Int, ts: Timestamp)

  /** 1e-4 quantization matching batch q170 and the DuckDB oracle
    * bit-for-bit: Spark's `round()` on DOUBLE is BigDecimal HALF_UP
    * (half away from zero), while `math.round` rounds half toward +∞ —
    * they disagree on negative half-units (-312.5 → -313 vs -312). */
  private[streaming] def quantize(x: Double): Long = {
    val v = x * 10000
    // non-finite / out-of-range degrade exactly like the batch path's
    // cast(round(v) as long): NaN -> 0, ±Inf and overflow clamp — a bad
    // embedding must not crash the stream (BigDecimal.valueOf throws on
    // NaN; longValueExact throws on overflow)
    if (v.isNaN) 0L
    else if (v >= Long.MaxValue.toDouble) Long.MaxValue
    else if (v <= Long.MinValue.toDouble) Long.MinValue
    else java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
  }

  /** q170's exact integer threshold predicate (cos ≥ num/den), BigInt so
    * the squares can't wrap. Zero-norm vectors match nothing; a
    * dimension MISMATCH matches nothing (the batch kernel VecIntDotNorms
    * nulls on it — a malformed embedding must not crash the stream).
    * Accumulation: Long on the fast path, promoted to BigInt when any
    * coordinate's square could wrap the Long sums (quantize clamps
    * non-finite inputs to ±Long.MaxValue, whose square alone wraps —
    * without the promotion such a degraded vector's keep/drop verdict
    * would be arbitrary wrapped garbage instead of the exact answer for
    * the clamped values). */
  private[streaming] def closeEnough(a: Array[Long], b: Array[Long],
      num: Int, den: Int): Boolean = {
    if (a.length != b.length || a.length == 0) return false
    // |x| ≤ safe ⟹ Σ x² over a.length terms fits a Long
    val safe = math.sqrt(Long.MaxValue.toDouble / a.length).toLong - 1
    var big = false
    var i = 0
    while (i < a.length && !big) {
      if (a(i) > safe || a(i) < -safe || b(i) > safe || b(i) < -safe) big = true
      i += 1
    }
    if (big) {
      var dot = BigInt(0); var n2a = BigInt(0); var n2b = BigInt(0)
      i = 0
      while (i < a.length) {
        val x = BigInt(a(i)); val y = BigInt(b(i))
        dot += x * y; n2a += x * x; n2b += y * y; i += 1
      }
      n2a > 0 && n2b > 0 && dot >= 0 &&
        (dot * den) * (dot * den) >= BigInt(num) * num * (n2a * n2b)
    } else {
      var dot = 0L; var n2a = 0L; var n2b = 0L
      i = 0
      while (i < a.length) {
        dot += a(i) * b(i); n2a += a(i) * a(i); n2b += b(i) * b(i); i += 1
      }
      n2a > 0 && n2b > 0 && dot >= 0 &&
        BigInt(dot) * den * (BigInt(dot) * den) >=
          BigInt(num) * num * (BigInt(n2a) * n2b)
    }
  }

  /** Nearest-centroid assignment, double cosine with ties toward the
    * larger c_id — the batch trainer/q170 argmax convention. Centroids
    * whose dimension differs from the vector's are SKIPPED (a malformed
    * vector lands in the all-skipped sentinel cluster Int.MinValue
    * instead of killing the stream with an index-out-of-bounds — and
    * can never emit a dup candidate there, since closeEnough also
    * rejects mismatched dims). */
  private[streaming] def assign(qv: Array[Long],
      cents: Array[(Int, Array[Long])]): Int = {
    var bestId = Int.MinValue
    var bestCos = Double.NegativeInfinity
    val n2 = math.sqrt(qv.map(x => x.toDouble * x).sum)
    cents.foreach { case (cId, c) =>
      if (c.length == qv.length) {
        val dot = qv.indices.map(i => qv(i).toDouble * c(i)).sum
        val cn = math.sqrt(c.map(x => x.toDouble * x).sum)
        val cos = if (n2 == 0 || cn == 0) -1.0 else dot / (n2 * cn)
        if (cos > bestCos || (cos == bestCos && cId > bestId)) {
          bestCos = cos; bestId = cId
        }
      }
    }
    bestId
  }

  final case class DecontamVerdict(vec_id: Long, ts: Timestamp, c_id: Int,
    n_eval_close: Long, contaminated: Boolean)

  /** Streaming SEMANTIC DECONTAMINATION gate — q198 at ingest time (ref
    * batch semantics: SimilarityQueries.q198): every arriving training
    * candidate is checked against the held EVAL SET's embeddings before
    * admission. Unlike dedup, the reference side is STATIC (the
    * benchmark doesn't grow with the corpus), so the gate is
    * STATELESS: assignment to the trained coarse quantizer and the
    * per-cluster eval comparison both run scan-side against
    * closure-captured side data (in production: `sparkContext
    * .broadcast` of the stored `cent_ivf` artifact and the eval
    * members' quantized vectors grouped by their OWN q198 assignment)
    * — no shuffle, no state store, the stream's throughput is the scan
    * throughput. The verdict is q198's exact integer predicate
    * (cos ≥ num/den over 1e-4-quantized coordinates, BigInt-safe), so
    * a (vector, eval-member) pair gets the same answer streamed or
    * batched — bit for bit, spec-pinned against q198 on the real
    * corpus. Malformed vectors degrade exactly like
    * [[semanticDupCandidates]]: NaN/Inf clamp in [[quantize]],
    * dimension mismatches assign to the sentinel cluster and match
    * nothing.
    */
  def semanticDecontamGate(
      vecs: DataFrame,
      centroids: Array[(Int, Array[Long])],
      evalByCluster: Map[Int, Seq[(Long, Array[Long])]],
      thresholdNum: Int = 3,
      thresholdDen: Int = 10): Dataset[DecontamVerdict] = {
    import vecs.sparkSession.implicits._
    vecs.as[Vec].map { v =>
      val qv = v.embedding.map(x => quantize(x.toDouble)).toArray
      val cId = assign(qv, centroids)
      val n = evalByCluster.getOrElse(cId, Nil)
        .count(e => closeEnough(e._2, qv, thresholdNum, thresholdDen))
      DecontamVerdict(v.vec_id, v.ts, cId, n.toLong, n > 0)
    }
  }

  /** vecs: (vec_id LONG, ts TIMESTAMP, embedding ARRAY<FLOAT>), batch or
    * streaming. `centroids` is the trained coarse quantizer (collected
    * from the `cent_ivf` artifact — IvfK rows, bounded by construction).
    * In batch execution timeouts are ignored and the operator
    * degenerates to admit-first over each cluster's full history — same
    * emission rule, tested both ways. */
  def semanticDupCandidates(
      vecs: DataFrame,
      centroids: Array[(Int, Array[Long])],
      thresholdNum: Int = 7,
      thresholdDen: Int = 20,
      watermark: String = "1 hour",
      horizonSeconds: Long = 3600L): Dataset[SemDup] = {
    import vecs.sparkSession.implicits._
    // watermark AFTER the typed map: MapElements mints a fresh `ts`
    // attribute, so a tag applied before it would not survive to the
    // stateful operator (observed as "Event-time timeout not supported
    // without watermark" at analysis)
    val assigned = vecs
      .as[Vec]
      .map { v =>
        val qv = v.embedding.map(x => quantize(x.toDouble)).toArray
        Assigned(v.vec_id, v.ts, assign(qv, centroids), qv)
      }
      .withWatermark("ts", watermark)

    assigned.groupByKey(_.c_id)
      .flatMapGroupsWithState[ClusterMembers, SemDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (cId: Int, rows: Iterator[Assigned], state: GroupState[ClusterMembers]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = try state.getCurrentWatermarkMs()
              catch { case _: UnsupportedOperationException => Long.MinValue }
            val horizonMs = horizonSeconds * 1000
            // expire members the watermark has passed (data is processed
            // before timeouts fire within a trigger — DocStreams' lesson)
            var members = state.getOption.map(_.members).getOrElse(Nil)
              .filter(m => wm == Long.MinValue || m.tsMs + horizonMs > wm)
            // deterministic within a trigger: earliest (ts, vec_id) first
            val sorted = rows.toSeq.sortBy(a => (a.ts.getTime, a.vec_id))
            val out = Seq.newBuilder[SemDup]
            sorted.foreach { a =>
              if (!members.exists(_.vec_id == a.vec_id)) {
                // dup_of = the EARLIEST admitted close member (members is
                // kept in admission order)
                members.find(m => closeEnough(m.qv, a.qv, thresholdNum, thresholdDen)) match {
                  case Some(m) => out += SemDup(a.vec_id, m.vec_id, cId, a.ts)
                  case None => members = members :+ Member(a.vec_id, a.ts.getTime, a.qv)
                }
              }
            }
            if (members.isEmpty) state.remove()
            else {
              state.update(ClusterMembers(members))
              // evict when the LAST member's horizon passes; intermediate
              // expiry is handled by the filter above on the next arrival
              val deadline = members.map(_.tsMs).max + horizonMs
              try state.setTimeoutTimestamp(
                if (wm == Long.MinValue) deadline else math.max(deadline, wm + 1))
              catch { case _: UnsupportedOperationException => () }
            }
            out.result().iterator
          }
      }
  }
}
