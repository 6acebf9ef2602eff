package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the events feed (SURVEY.md §2.9: streaming
  * is the engine's extension surface — the reference's closest analog is
  * its batch watermark file).
  *
  * Every transform below takes a DataFrame that may be batch OR
  * streaming: the logical plan is identical, only the sink differs. The
  * batch twins in [[graft.operators.EventQueries]] are the oracle: a
  * streaming run over the same rows must converge to the batch answer.
  *
  * Scale notes: watermarks bound state (late rows beyond the horizon are
  * dropped, state for closed windows is evicted); the groupBy shuffles
  * on (window, key) exactly like the batch agg; `session_window` merges
  * per-key sorted runs, state sized by open sessions, not history.
  */
object EventStreams {

  /** Tumbling fixed windows with an event-time watermark — the streaming
    * form of q30 (1-hour buckets, exact-cents sums).
    */
  def tumbling(events: DataFrame, size: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("value_cents"))

  /** Sliding windows (each event lands in size/slide windows). */
  def sliding(events: DataFrame, size: String = "1 hour", slide: String = "15 minutes",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("event_type"), col("n"))

  /** Gap-based sessions via the built-in session_window — the streaming
    * form of q31's lag+cumsum sessionization. Emits one row per closed
    * session; `session_end` is the last event ts (window.end minus the
    * gap), matching the batch twin's max(ts).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), min("ts").as("session_start"),
        max("ts").as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))

  /** Stream-stream inner join: each click matched to same-user views in
    * the preceding `horizon`. Both sides carry watermarks and the join
    * has a time-range predicate, so state is bounded: a buffered view is
    * evicted once the click-side watermark passes view_ts + horizon —
    * without BOTH the watermark and the range bound, state grows forever.
    * Shuffles both streams once, on user_id.
    */
  def clickToRecentViews(clicks: DataFrame, views: DataFrame,
      horizon: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val v = views.withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("view_ts"))
    c.join(v, col("user_id") === col("v_user_id") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $horizon"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
  }

  /** Streaming exact dedup on a key. dropDuplicatesWithinWatermark keeps
    * per-key state only until the watermark passes the first-seen event
    * time — bounded state, versus plain dropDuplicates whose streaming
    * state never ages out. The batch twin is q50's groupBy-first dedup.
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp)
  final case class SessionState(start: Timestamp, last: Timestamp, n: Long)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Custom stateful sessionization with flatMapGroupsWithState — the
    * state-API escape hatch for session semantics session_window can't
    * express. Emits a session when a newer event closes it, or when the
    * event-time timeout fires (watermark passed last + gap) — so idle
    * users' final sessions ARE emitted and their state is evicted,
    * keeping the store O(users active within the watermark horizon),
    * not O(all users ever seen).
    *
    * Out-of-order robustness: events WITHIN a trigger are sorted, and an
    * event older than the open session's `last` (late arrival across
    * triggers, inside the watermark) extends the span via min/max
    * instead of rewinding `last` — a rewind would spuriously split the
    * session on the next event and diverge from the batch twin.
    *
    * The input must carry a watermark on `ts` (caller applies
    * `withWatermark` before groupByKey) for the timeout to fire in
    * streaming; in batch execution timeouts are ignored and only
    * close-by-newer-event applies (q31-parity tested).
    */
  def sessionizeStateful(events: Dataset[Ev], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed last + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.last, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val (closed, open) = sorted.foldLeft(
              (List.empty[SessionState], state.getOption)) {
              case ((done, None), e) =>
                (done, Some(SessionState(e.ts, e.ts, 1)))
              case ((done, Some(s)), e) =>
                if (e.ts.getTime - s.last.getTime > gapSeconds * 1000)
                  (s :: done, Some(SessionState(e.ts, e.ts, 1)))
                else (done, Some(SessionState(
                  start = if (e.ts.before(s.start)) e.ts else s.start,
                  last = if (e.ts.after(s.last)) e.ts else s.last,
                  n = s.n + 1)))
            }
            open.foreach { s =>
              state.update(s)
              // fire once the event-time watermark passes the gap horizon;
              // in batch execution there is no watermark and Spark rejects
              // the call — timeouts can't occur there anyway, so skip it
              try state.setTimeoutTimestamp(s.last.getTime + gapSeconds * 1000)
              catch { case _: UnsupportedOperationException => () }
            }
            closed.reverseIterator.map(s => Session(user, s.start, s.last, s.n))
          }
      }
  }

  /** Batch-mode stateful sessionization: folds each user's full history
    * and emits every session (open one included) — must agree with q31.
    */
  def sessionizeBatch(events: Dataset[Ev], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups { (user: Long, rows: Iterator[Ev]) =>
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val (closed, open) = sorted.foldLeft(
          (List.empty[SessionState], Option.empty[SessionState])) {
          case ((done, None), e) => (done, Some(SessionState(e.ts, e.ts, 1)))
          case ((done, Some(s)), e) =>
            if (e.ts.getTime - s.last.getTime > gapSeconds * 1000)
              (s :: done, Some(SessionState(e.ts, e.ts, 1)))
            else (done, Some(s.copy(last = e.ts, n = s.n + 1)))
        }
        (open.toList ::: closed).reverseIterator
          .map(s => Session(user, s.start, s.last, s.n))
      }
  }

  final case class FunnelEv(user_id: Long, ts: Timestamp, event_type: String,
      event_id: Long)
  final case class FunnelState(firstViewEs: Option[Long], converted: Boolean)
  final case class Conversion(user_id: Long, gap_seconds: Long, ts: Timestamp)

  /** Streaming CONVERSION-LATENCY gate — q242's funnel question
    * answered the moment it becomes answerable: per user, state holds
    * the epoch-second of the FIRST view; the first purchase at or
    * after it emits (user, latency) exactly once and flips the state
    * to converted (later purchases are silent, matching q242's MIN).
    * Genuinely stateful with REAL eviction: unlike the monotone
    * pack/HLL folds, funnel state must not live forever — an
    * EventTimeTimeout clears users whose first view passed the
    * watermark unconverted (they are q242's `-1` bucket; at timeout
    * the state just dies, emitting nothing, because "didn't convert"
    * is the absence the batch histogram counts, not an event). Within
    * a trigger rows fold in (es, event_id) order; across triggers the
    * feed is event-time ordered (the intake contract the other gates
    * share). `ConversionStreamSpec` pins per-user latencies ≡ the
    * batch v/p definition over the full corpus and the
    * one-emission-per-user contract.
    *
    * Scale shape: one user-keyed stateful shuffle; state is two longs
    * per user IN the horizon (watermark-evicted), not per user ever
    * seen. */
  def conversionGate(
      events: DataFrame,
      watermark: String = "30 days"): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    val rows = events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .as[FunnelEv]
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rs: Iterator[FunnelEv], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // unconverted past the horizon: q242's -1 bucket is an
            // absence, so eviction emits nothing
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelState(None, converted = false))
            val out = scala.collection.mutable.ListBuffer.empty[Conversion]
            var maxEs = Long.MinValue
            // views sort before purchases at the same second so a
            // same-second conversion qualifies, exactly as the batch
            // predicate p_es >= v_es does
            rs.toSeq.sortBy(e => (e.ts.getTime,
              if (e.event_type == "view") 0 else 1, e.event_id)).foreach { e =>
              val es = e.ts.getTime / 1000L
              if (es > maxEs) maxEs = es
              e.event_type match {
                case "view" if st.firstViewEs.isEmpty =>
                  st = st.copy(firstViewEs = Some(es))
                case "purchase" if st.firstViewEs.isDefined && !st.converted =>
                  out += Conversion(user, es - st.firstViewEs.get, e.ts)
                  st = st.copy(converted = true)
                case _ => ()
              }
            }
            state.update(st)
            if (maxEs != Long.MinValue)
              state.setTimeoutTimestamp(maxEs * 1000L, watermark)
            out.iterator
          }
      }
  }

  final case class AnonEv(event_id: Long, user_id: Long, ts: Timestamp,
      event_type: String)
  final case class AnonState(opened: Boolean, buffer: List[AnonEv])
  final case class AnonAdmit(event_id: Long, user_id: Long, ts: Timestamp,
      event_type: String, qi_hour: Long)

  /** Streaming K-ANONYMITY suppression gate — q247's release rule
    * enforced AT ingest: an event may only leave the trust boundary
    * once its quasi-identifier group (event_type, hour) holds ≥ K rows.
    * Events arriving before their group fills are WITHHELD in state;
    * the K-th arrival opens the gate and releases the buffer, and every
    * later arrival in an open group flows straight through. Groups that
    * never reach K past the watermark horizon time out and their buffer
    * dies unemitted — suppression is an absence, exactly like q247
    * counts it (rows_at_risk are rows the release never ships).
    *
    * Genuinely stateful with BOUNDED state: a closed group buffers at
    * most K-1 events (the K-th opens it), an open group holds a single
    * boolean — so state is O(K) per group in the horizon, watermark-
    * evicted, never history-sized. One QI-keyed stateful shuffle.
    * `KAnonStreamSpec` pins the admitted set ≡ the batch rule (groups
    * with total ≥ K admit every row, groups below K admit none). */
  def kAnonGate(
      events: DataFrame,
      k: Int = 5,
      watermark: String = "30 days"): Dataset[AnonAdmit] = {
    import events.sparkSession.implicits._
    val rows = events
      .withWatermark("ts", watermark)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[AnonEv]
    rows.groupByKey(e => (e.event_type, e.ts.getTime / 1000L / 3600L))
      .flatMapGroupsWithState[AnonState, AnonAdmit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, Long), rs: Iterator[AnonEv],
            state: GroupState[AnonState]) =>
          if (state.hasTimedOut) {
            // never filled: the withheld buffer is suppressed — absence,
            // not an emission, mirroring q247's rows_at_risk
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(AnonState(opened = false, Nil))
            val out = scala.collection.mutable.ListBuffer.empty[AnonAdmit]
            var maxEs = Long.MinValue
            rs.foreach { e =>
              val es = e.ts.getTime / 1000L
              if (es > maxEs) maxEs = es
              if (st.opened)
                out += AnonAdmit(e.event_id, e.user_id, e.ts, e.event_type,
                  key._2)
              else {
                val buf = e :: st.buffer
                if (buf.length >= k) {
                  buf.reverseIterator.foreach(b =>
                    out += AnonAdmit(b.event_id, b.user_id, b.ts,
                      b.event_type, key._2))
                  st = AnonState(opened = true, Nil)
                } else st = AnonState(opened = false, buf)
              }
            }
            state.update(st)
            if (maxEs != Long.MinValue)
              state.setTimeoutTimestamp(maxEs * 1000L, watermark)
            out.iterator
          }
      }
  }

  final case class PitCand(o_orderkey: Long, ts: Timestamp, o_custkey: Long,
      order_date: java.sql.Date, o_orderstatus: String,
      eff_from: Option[java.sql.Date], version: Option[Long],
      era_status: Option[String])
  final case class PitEnriched(o_orderkey: Long, o_custkey: Long,
      order_date: java.sql.Date, version: Option[Long],
      era_status: Option[String], status_matches: Option[Boolean],
      ts: Timestamp)

  /** Streaming POINT-IN-TIME SCD2 enrichment gate — q138's as-of lookup
    * at ingest time: each ARRIVING order resolves the dimension version
    * in effect at its own date the moment it enters the pipeline,
    * instead of in a batch backfill. The dimension is q138's deduped
    * version table (`ExtensionQueries.scd2Versions` — the ONE shared
    * build, so stream and batch cannot disagree on eras): a static
    * frame, KBs against a TB stream, joined stream-static LEFT OUTER on
    * custkey with the `eff_from <= order_date` range predicate — the
    * broadcast shape, never a shuffle of the stream beyond the probe
    * key. The per-probe as-of pick (LATEST eff_from ≤ date, q138's
    * backward rule; eff_from is unique per custkey post-dedup so no
    * further tie) folds in a ZERO-state flatMapGroupsWithState
    * (NoTimeout, state never set): all of a probe's candidate versions
    * land in its arrival trigger, so the group is complete evidence and
    * the verdict emits immediately. Probes with no era yet (date before
    * the first version, unknown custkey) flow through with NULL
    * version/era — q138's LEFT semantics. Stream ≡ batch pinned by
    * `PitEnrichStreamSpec` over the full orders probe set.
    */
  def pitEnrich(
      probes: DataFrame,
      versions: DataFrame,
      watermark: String = "1 hour"): Dataset[PitEnriched] = {
    import probes.sparkSession.implicits._
    val p = probes
      .withWatermark("ts", watermark)
      .select(col("o_orderkey"), col("ts"), col("o_custkey"),
        to_date(col("o_orderdate")).as("order_date"), col("o_orderstatus"))
    val vers = versions.select(col("o_custkey").as("v_custkey"),
      to_date(col("eff_from")).as("eff_from"), col("version"),
      col("era_status"))
    // the range predicate lives IN the join: non-applicable (future)
    // versions never produce a row, while a probe with no applicable
    // version keeps its single all-NULL row — q138's LEFT semantics
    val cands = p
      .join(vers, p("o_custkey") === vers("v_custkey") &&
        col("eff_from") <= col("order_date"), "left_outer")
      .select(col("o_orderkey"), col("ts"), col("o_custkey"),
        col("order_date"), col("o_orderstatus"),
        col("eff_from"), col("version"), col("era_status"))
      .as[PitCand]
    cands.groupByKey(_.o_orderkey)
      .flatMapGroupsWithState[Boolean, PitEnriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[PitCand], _: GroupState[Boolean]) =>
          val rs = rows.toSeq
          val head = rs.head
          val applicable = rs.filter(_.eff_from.isDefined)
          val best =
            if (applicable.isEmpty) None
            else Some(applicable.maxBy(_.eff_from.get.getTime))
          Iterator.single(PitEnriched(head.o_orderkey, head.o_custkey,
            head.order_date,
            best.flatMap(_.version), best.flatMap(_.era_status),
            best.flatMap(_.era_status)
              .map(es => head.o_orderstatus == es),
            rs.map(_.ts).maxBy(_.getTime)))
      }
  }

  final case class AbEv(user_id: Long, ts: Timestamp, event_type: String)
  final case class AbState(converted: Boolean)
  final case class AbUpdate(user_id: Long, arm: String, kind: String,
      ts: Timestamp)

  /** q268's md5 last-nibble arm rule, replayed in Scala — the ONE
    * assignment the batch test, the peeking audit and this gate share
    * (`AbGateStreamSpec` pins Scala ≡ SQL over the corpus). */
  private[streaming] def abArm(userId: Long): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(userId.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    if ("02468ace".indexOf(hex.charAt(31)) >= 0) "A" else "B"
  }

  /** Streaming A/B MONITOR gate — the live feed under q268/q273: each
    * user emits ONE 'enrolled' row (first event ever seen) and at most
    * ONE 'converted' row (first purchase), tagged with the shared
    * md5-nibble arm, so a downstream per-arm running count IS q268's
    * (n, c) at every instant — without re-scanning history. State is
    * one boolean per user inside the watermark horizon,
    * EventTimeTimeout-evicted; a user returning AFTER eviction
    * re-enrolls (a visible duplicate the monitor dedups by design —
    * bounded state is the trade, exactly conversionGate's horizon
    * semantics). Within-horizon feeds split at EVENT-TIME-ORDERED
    * trigger boundaries emit exactly the batch per-arm counts
    * (`AbGateStreamSpec`); like transitionGate, a within-watermark
    * late arrival in a later trigger folds in arrival order — the
    * intake contract is the time-ordered feed the gates share. */
  def abGate(
      events: DataFrame,
      watermark: String = "30 days"): Dataset[AbUpdate] = {
    import events.sparkSession.implicits._
    val rows = events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[AbEv]
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[AbState, AbUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rs: Iterator[AbEv], state: GroupState[AbState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ListBuffer.empty[AbUpdate]
            val arm = abArm(user)
            var st = state.getOption
            var maxEs = Long.MinValue
            rs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val es = e.ts.getTime / 1000L
              if (es > maxEs) maxEs = es
              if (st.isEmpty) {
                out += AbUpdate(user, arm, "enrolled", e.ts)
                st = Some(AbState(converted = false))
              }
              if (e.event_type == "purchase" && !st.get.converted) {
                out += AbUpdate(user, arm, "converted", e.ts)
                st = Some(AbState(converted = true))
              }
            }
            st.foreach(state.update)
            if (maxEs != Long.MinValue)
              state.setTimeoutTimestamp(maxEs * 1000L, watermark)
            out.iterator
          }
      }
  }

  final case class TransEv(user_id: Long, ts: Timestamp, event_type: String,
      event_id: Long)
  final case class TransState(es: Long, eventId: Long, tpe: String)
  final case class Transition(user_id: Long, prev_type: String,
      next_type: String, ts: Timestamp)

  /** Streaming MARKOV-TRANSITION gate — q264's consecutive-pair
    * extraction at ingest: each arriving event pairs with the user's
    * previous event (q264's (epoch-second, event_id) ordering applied
    * within each trigger; across triggers the retained last event IS
    * the order) and emits one (prev_type → next_type) transition row —
    * the live feed a next-event model or funnel-leak monitor consumes
    * without waiting for the batch pass.
    *
    * State is ONE (es, event_id, type) triple per user — constant per
    * key, bounded by users active inside the watermark horizon, and
    * EVICTED via EventTimeTimeout when a user goes quiet past it: a
    * later event starts a fresh chain, so no transition spans an
    * eviction gap (the would-be pair's earlier half is below the
    * watermark, i.e. late data by definition — an absence, exactly
    * like conversionGate's unconverted timeout). Within-horizon feeds
    * split at EVENT-TIME-ORDERED trigger boundaries emit exactly the
    * batch q264 pair multiset (`TransitionStreamSpec` pins both
    * properties). The ordering qualifier is load-bearing: a
    * within-watermark late event arriving in a LATER trigger pairs
    * against the retained (newer) state row in arrival order, which
    * diverges from q264's global (epoch-second, event_id) order —
    * the intake contract here is the event-time-ordered feed the
    * other gates (conversionGate, abGate) share. */
  def transitionGate(
      events: DataFrame,
      watermark: String = "30 days"): Dataset[Transition] = {
    import events.sparkSession.implicits._
    val rows = events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .as[TransEv]
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rs: Iterator[TransEv], state: GroupState[TransState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rs.toSeq.sortBy(e => (e.ts.getTime / 1000L, e.event_id))
            val out = scala.collection.mutable.ListBuffer.empty[Transition]
            var prev = state.getOption
            var maxEs = Long.MinValue
            sorted.foreach { e =>
              val es = e.ts.getTime / 1000L
              if (es > maxEs) maxEs = es
              prev.foreach(p =>
                out += Transition(user, p.tpe, e.event_type, e.ts))
              prev = Some(TransState(es, e.event_id, e.event_type))
            }
            prev.foreach(state.update)
            if (maxEs != Long.MinValue)
              state.setTimeoutTimestamp(maxEs * 1000L, watermark)
            out.iterator
          }
      }
  }

  // has1 is an explicit presence flag for the older slot: overloading
  // es1 = -1 as "absent" conflated a legitimate pre-1970 event (epoch
  // second <= 0) with "no older event" and silently dropped triples
  // spanning a state restore
  final case class Tri2State(es1: Long, id1: Long, t1: String,
      es2: Long, id2: Long, t2: String, has1: Boolean)
  final case class Trigram(user_id: Long, t1: String, t2: String,
      t3: String, ts: Timestamp)

  /** Streaming TRIGRAM gate — q285's consecutive-triple extraction at
    * ingest (the second-order sibling of [[transitionGate]]): each
    * arriving event closes a (t1, t2, t3) pattern against the user's
    * retained last TWO events and emits one row — the live feed a
    * funnel-order monitor consumes without the batch double-lag pass.
    *
    * State is TWO (es, event_id, type) triples per user — still
    * constant per key, watermark-evicted exactly like transitionGate
    * (a user quiet past the horizon starts a fresh chain: the first
    * two events after eviction emit nothing, matching the batch
    * NULL-lag rows). Same intake contract as the other gates:
    * within-horizon feeds split at event-time-ordered trigger
    * boundaries emit exactly the batch q285 triple multiset
    * (`TrigramStreamSpec` pins multiset equality and the eviction
    * chain-break). */
  /** Per-group trigram fold, factored out of the stream closure so the
    * state-restore path is unit-testable without a running stream (the
    * pre-epoch case can't be driven end-to-end: the initial watermark
    * is 0ms, so negative-epoch events are filtered as late before the
    * gate sees them — which is exactly why the old es1 = -1 "absent"
    * sentinel encoding was LATENT, not observed). Returns the emitted
    * triples and the replacement state (None when the batch carried no
    * rows for the key). */
  private[streaming] def foldTrigrams(
      user: Long, st: Option[Tri2State], sorted: Seq[TransEv])
      : (Seq[Trigram], Option[Tri2State]) = {
    val out = scala.collection.mutable.ListBuffer.empty[Trigram]
    // (older, newer) retained pair; either may be absent
    var pending: Option[(Long, Long, String)] = st match {
      case Some(s) => Some((s.es2, s.id2, s.t2))
      case None => None
    }
    var older: Option[(Long, Long, String)] = st match {
      case Some(s) if s.has1 => Some((s.es1, s.id1, s.t1))
      case _ => None
    }
    sorted.foreach { e =>
      val es = e.ts.getTime / 1000L
      (older, pending) match {
        case (Some(o), Some(p)) =>
          out += Trigram(user, o._3, p._3, e.event_type, e.ts)
        case _ => ()
      }
      older = pending
      pending = Some((es, e.event_id, e.event_type))
    }
    val next = pending.map { p =>
      val o = older.getOrElse((0L, 0L, ""))
      Tri2State(o._1, o._2, o._3, p._1, p._2, p._3, older.isDefined)
    }
    (out.toSeq, next)
  }

  def trigramGate(
      events: DataFrame,
      watermark: String = "30 days"): Dataset[Trigram] = {
    import events.sparkSession.implicits._
    val rows = events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .as[TransEv]
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[Tri2State, Trigram](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rs: Iterator[TransEv], state: GroupState[Tri2State]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rs.toSeq.sortBy(e => (e.ts.getTime / 1000L, e.event_id))
            val (out, next) = foldTrigrams(user, state.getOption, sorted)
            next.foreach(state.update)
            val maxEs =
              if (sorted.isEmpty) Long.MinValue
              else sorted.map(_.ts.getTime / 1000L).max
            if (maxEs != Long.MinValue)
              state.setTimeoutTimestamp(maxEs * 1000L, watermark)
            out.iterator
          }
      }
  }

  final case class CuEv(event_id: Long, ts: Timestamp, event_type: String)
  final case class CuDay(day: Long, x: Long)
  final case class CuState(days: Seq[CuDay])
  final case class CuVerdict(event_type: String, n_days: Long,
      ref_micro: Long, last_day: Long, last_x: Long, cusum_micro: String,
      alarm: Long, n_alarms: Long, ts: Timestamp)

  /** Streaming CUSUM drift gate — the ingest-time twin of q369: per
    * event type, is daily volume drifting off its own mean fast enough
    * to page? State per type is the (day → count) map — the SAME
    * rollup the batch query reduces to, so state is day-axis-bounded
    * (grows with TIME, never with volume) and pure counts, hence
    * order- and trigger-boundary-independent: any arrival order
    * converges to the batch answer (`CusumStreamSpec` pins
    * reverse-order two-trigger ≡ q369 bit-for-bit on the final day's
    * walk). Each trigger re-derives the whole closed-form walk from
    * the map — ref/slack/threshold recomputed over everything observed
    * so far, exactly the batch semantics (a self-calibrating chart:
    * early triggers see a shorter history, later triggers converge) —
    * in BigInt (the batch arm's DECIMAL(38,0)), and emits the LATEST
    * day's S + alarm plus the walk's alarm-day count. No watermark
    * eviction: day counts only ratchet up, like [[DocStreams.hllGate]]
    * registers. */
  def cusumGate(
      events: DataFrame,
      watermark: String = "30 days"): Dataset[CuVerdict] = {
    import events.sparkSession.implicits._
    val rows = events
      .withWatermark("ts", watermark)
      .select(col("event_id"), col("ts"), col("event_type"))
      .as[CuEv]
    rows.groupByKey(_.event_type)
      .flatMapGroupsWithState[CuState, CuVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (typ: String, rs: Iterator[CuEv], state: GroupState[CuState]) =>
          val m = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(_.days.foreach(d => m(d.day) = d.x))
          var maxTs: Timestamp = null
          rs.foreach { ev =>
            val day = Math.floorDiv(ev.ts.getTime / 1000L, 86400L)
            m(day) = m.getOrElse(day, 0L) + 1L
            if (maxTs == null || ev.ts.after(maxTs)) maxTs = ev.ts
          }
          state.update(CuState(m.toSeq.sortBy(_._1)
            .map { case (day, x) => CuDay(day, x) }))
          // the batch walk, re-derived closed-form: ref = mean·10⁶
          // (floor), k = ref/8, dev prefix sums, running min, S =
          // prefix − min(0, runmin), alarm when S > ref — BigInt so the
          // 10⁶-scaled prefixes never wrap (the q350 lesson)
          val days = m.toSeq.sortBy(_._1)
          val nDays = days.size.toLong
          val total = days.map(d => BigInt(d._2)).sum
          val ref = total * 1000000 / nDays
          val k = ref / 8
          var prefix = BigInt(0); var runMin = BigInt(0)
          var lastS = BigInt(0); var nAlarms = 0L
          days.foreach { case (_, x) =>
            prefix += BigInt(x) * 1000000 - ref - k
            if (prefix < runMin) runMin = prefix
            lastS = prefix - (if (runMin < 0) runMin else BigInt(0))
            if (lastS > ref) nAlarms += 1
          }
          val (lastDay, lastX) = days.last
          Iterator.single(CuVerdict(typ, nDays, ref.toLong, lastDay, lastX,
            lastS.toString, if (lastS > ref) 1L else 0L, nAlarms, maxTs))
      }
  }
}
