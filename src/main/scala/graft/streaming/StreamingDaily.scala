package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming formulations of the daily operators (SURVEY §2.10
  * D4 notes the reference is batch-only; the Spark-native engine exposes
  * the same daily-grain semantics over unbounded streams).
  *
  * Transformations are source-agnostic `DataFrame => DataFrame` — the
  * caller binds `spark.readStream` (kafka/files) or a MemoryStream in
  * tests. Watermarks bound state; aggregations use event-time windows so
  * late data folds into the right day until the watermark closes it.
  */
object StreamingDaily {

  /** A2-on-a-stream: per event-time day and key, incremental
    * mean/min/max/count with a watermark for state eviction. */
  def dailyStats(events: DataFrame, tsCol: String, keyCol: String,
                 valueCol: String, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day").as("day"), col(keyCol))
      .agg(
        avg(col(valueCol)).as("v_mean"),
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"),
        count(lit(1)).as("n"))
      .select(col("day.start").cast("date").as("date"), col(keyCol),
        col("v_mean"), col("v_min"), col("v_max"), col("n"))

  /** Corpus exact-dedup on a stream: content-hash
    * `dropDuplicatesWithinWatermark` — continuous training-data ingest
    * keeps only the first arrival of each document within the dedup
    * horizon. The within-watermark variant is what makes the scale claim
    * true: plain `dropDuplicates` on a subset that excludes the
    * event-time column NEVER evicts its state (it grows with every
    * distinct hash ever seen); within-watermark keys state by the dedup
    * column and drops each entry once the watermark passes its arrival,
    * so state size is bounded by (distinct docs per horizon), not the
    * corpus. Contract: duplicates are guaranteed dropped only when they
    * arrive within the watermark delay of the first copy — re-arrivals
    * beyond the horizon re-emit, which is the documented semantics of a
    * horizon-bounded dedup. */
  def streamingExactDedup(docs: DataFrame, tsCol: String, textCol: String,
                          watermark: String = "1 day"): DataFrame =
    docs
      .withColumn("text_sha", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_sha")

  /** D5-on-a-stream: per event-time window, the population stability
    * index of `valueCol` against a FIXED reference distribution — the
    * production drift monitor: the reference deciles come from a batch
    * training snapshot (d5_psi's train side), the stream is scored
    * against them continuously.
    *
    * Streaming disallows chained aggregations, so the per-window bin
    * histogram is ONE aggregation with the bins pivoted into conditional
    * sums (bin count is fixed by the reference boundaries), and the PSI
    * is a stateless projection over that single row — the plan stays a
    * watermarked windowed agg whose state is one row of
    * `boundaries+1` longs per open window. Same arithmetic as the batch
    * d5_psi: both distributions 1e-6-clamped, (p-q)·ln(p/q) summed.
    *
    * @param refBoundaries ascending bin edges (e.g. train deciles)
    * @param refShares     reference share per bin, size boundaries+1 */
  def streamingPsi(events: DataFrame, tsCol: String, valueCol: String,
                   refBoundaries: Seq[Double], refShares: Seq[Double],
                   windowDur: String = "1 day",
                   watermark: String = "1 day"): DataFrame = {
    require(refShares.size == refBoundaries.size + 1,
      s"refShares must have ${refBoundaries.size + 1} entries, got ${refShares.size}")
    require(refBoundaries == refBoundaries.sorted, "refBoundaries must ascend")
    // a mis-built reference snapshot must fail fast, not clamp to 1e-6
    // and emit a silently-garbage PSI: shares below the clamp floor
    // would be silently distorted, so the floor IS the validity bound
    require(refShares.forall(_ >= 1e-6),
      s"refShares must all be >= 1e-6 (the PSI zero-clamp floor), got $refShares")
    require(math.abs(refShares.sum - 1.0) < 1e-6,
      s"refShares must sum to 1, got ${refShares.sum}")
    val nBins = refBoundaries.size + 1
    val bin = refBoundaries.map(b => (col(valueCol) > b).cast("int"))
      .reduce(_ + _)
    val counts = (0 until nBins).map(i =>
      sum(when(col("__bin") === i, 1L).otherwise(0L)).as(s"n$i"))
    val agg = events
      .withWatermark(tsCol, watermark)
      .withColumn("__bin", bin)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(counts.head, counts.tail: _*)
    val total = (0 until nBins).map(i => col(s"n$i")).reduce(_ + _)
    val psi = refShares.zipWithIndex.map { case (p, i) =>
      val q = greatest(col(s"n$i").cast("double") / total, lit(1e-6))
      // p >= 1e-6 is require'd above, so no reference-side clamp: the
      // caller's shares are used exactly as supplied
      (lit(p) - q) * log(lit(p) / q)
    }.reduce(_ + _)
    agg.select(col("w.start").cast("date").as("date"), total.as("n"),
      round(psi, 6).as("psi"))
  }

  /** Distinct-count-on-a-stream via the portable HyperLogLog of
    * [[graft.operators.Sketches]]: per event-time window, the register
    * table (bucket → max rho) as ONE watermarked streaming aggregation —
    * max is the sketch's merge, so incremental micro-batch folding IS
    * register merging and the final table per window is bit-identical to
    * the batch [[graft.operators.Sketches.hllRegisters]] over the same
    * rows (pinned in the spec). State per open window is bounded at
    * m = 1024 register rows regardless of stream volume — the reason a
    * distinct count is streamable at all (exact distinct state grows
    * with cardinality). Estimate downstream from the sink table via
    * [[graft.operators.Sketches.hllEstimate]]. */
  def streamingHllRegisters(events: DataFrame, tsCol: String,
                            valueCol: String,
                            windowDur: String = "1 day",
                            watermark: String = "1 day"): DataFrame = {
    val (bucket, rho) = graft.operators.Sketches.registerCols(col(valueCol))
    events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), bucket.as("bucket"), rho.as("rho"))
      .groupBy(window(col(tsCol), windowDur).as("w"), col("bucket"))
      .agg(max("rho").as("m_reg"))
      .select(col("w.start").cast("date").as("date"), col("bucket"),
        col("m_reg"))
  }

  /** Frequency-sketch-on-a-stream: the Count-Min cell table of
    * [[graft.operators.Sketches]] as ONE watermarked windowed count
    * aggregation — CM is linear, so micro-batch folding (sum) IS the
    * sketch merge, mirroring [[streamingHllRegisters]]'s max. State per
    * open window is bounded at depth × width cells regardless of stream
    * volume; spec pins the final table equal to the batch build. */
  def streamingCountMinCells(events: DataFrame, tsCol: String,
                             valueCol: String,
                             windowDur: String = "1 day",
                             watermark: String = "1 day"): DataFrame = {
    import graft.operators.Sketches
    events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol),
        explode(Sketches.cmCellsOf(col(valueCol))).as("rc"))
      .groupBy(window(col(tsCol), windowDur).as("w"),
        col("rc.row_i").as("row_i"), col("rc.col_i").as("col_i"))
      .agg(count(lit(1)).as("cell"))
      .select(col("w.start").cast("date").as("date"), col("row_i"),
        col("col_i"), col("cell"))
  }

  /** Corpus NEAR-dup dedup on a stream — the stream-safe approximation:
    * documents collapsing to the same `bits`-bit SimHash signature
    * (near-identical token multisets — reordered/lightly-edited
    * boilerplate) keep only their first arrival within the watermark
    * horizon. Signature equality needs only per-key state
    * (`dropDuplicatesWithinWatermark` on the signature, which evicts
    * each entry once the watermark passes it), so state stays bounded by
    * (distinct signatures per horizon) exactly like
    * [[streamingExactDedup]] — and with the same horizon-bounded
    * contract: a signature re-arriving after the horizon re-emits.
    *
    * Deliberate scope: banded hamming-distance matching (the batch
    * path's `simhashPairs`, hamming ≤ k > 0) requires cross-row joins
    * whose streaming state grows with every band bucket ever seen —
    * that tier stays in the batch/incremental path
    * (`Dedup.incrementalDedup`) over micro-batch snapshots. Emitted
    * rows carry `sim_sig` so a downstream batch pass can band them
    * without re-hashing. */
  def streamingSimhashDedup(docs: DataFrame, tsCol: String, textCol: String,
                            bits: Int = 64,
                            watermark: String = "1 day"): DataFrame =
    docs
      .withColumn("sim_sig", graft.operators.Dedup.simhashOverHashed(
        graft.operators.Dedup.hashedTokens(col(textCol)), bits))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("sim_sig")

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(sessionId: Long, lastEpoch: Long, count: Long, sum: Double)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        value_sum: Double, closed: Boolean)

  /** W4-on-a-stream: gap-based sessionization via per-key state
    * (`flatMapGroupsWithState`): events more than `gapSeconds` after the
    * previous one start a new session; a session is emitted when the gap
    * CLOSES it.
    *
    * `idleTimeout`: with None, emission is purely event-driven — a key's
    * final session stays open in state until a later event closes it
    * (deterministic in tests). With Some(duration), a
    * ProcessingTimeTimeout is armed after every update; if a key sees no
    * data for that long, its open session is FLUSHED (`closed = false`,
    * distinguishing timeout flushes from gap closes) and its state
    * removed — so final sessions emit and idle-key state is reclaimed
    * instead of living forever. */
  /** Pure per-key transition: fold one micro-batch of a key's events into
    * its session state, emitting every session CLOSED by a gap. Exposed
    * so the state machine is testable deterministically (no wall clock);
    * [[sessionize]] binds it to flatMapGroupsWithState. */
  def sessionStep(uid: Long, events: Seq[SessionEvent],
                  st0: Option[SessionState], gapSeconds: Long)
      : (SessionState, Seq[SessionOut]) = {
    val sorted = events.sortBy(e => (e.ts.getTime, e.value))
    var st = st0.getOrElse(SessionState(0L, Long.MinValue, 0L, 0.0))
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    sorted.foreach { e =>
      val epoch = e.ts.getTime / 1000
      if (st.count > 0 && epoch - st.lastEpoch > gapSeconds) {
        out += SessionOut(uid, st.sessionId, st.count, st.sum, closed = true)
        st = SessionState(st.sessionId + 1, epoch, 1L, e.value)
      } else {
        st = SessionState(
          if (st.count == 0) st.sessionId + 1 else st.sessionId,
          epoch, st.count + 1, st.sum + e.value)
      }
    }
    (st, out.toSeq)
  }

  /** Pure idle-flush: the open session emitted (closed = false —
    * distinguishing timeout flushes from gap closes) when a key's state
    * times out; None if the state holds no open session. */
  def sessionFlush(uid: Long, st: SessionState): Option[SessionOut] =
    if (st.count > 0)
      Some(SessionOut(uid, st.sessionId, st.count, st.sum, closed = false))
    else None

  /** Pure timeout transition: (next state, emission). An open session
    * flushes to a TOMBSTONE that preserves the session counter (count =
    * 0) instead of removing state outright — removal would restart the
    * per-key numbering at 1 and a resumed key would emit duplicate
    * (user_id, session_id) rows. Only a second consecutive idle timeout
    * (state already a tombstone: nothing left to flush) reclaims the
    * state; a key silent for two idle periods restarts numbering, which
    * is the documented bound of the id contract. */
  def sessionTimeout(uid: Long, st: SessionState)
      : (Option[SessionState], Option[SessionOut]) =
    if (st.count > 0)
      (Some(SessionState(st.sessionId, st.lastEpoch, 0L, 0.0)),
        sessionFlush(uid, st))
    else (None, None)

  case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp, step: String)
  case class FunnelState(stepIdx: Int, lastEpoch: Long, anchorEpoch: Long)
  case class FunnelOut(user_id: Long, step_idx: Long, step: String, ts_epoch: Long)

  /** Pure per-key funnel transition (the E4 state machine on a stream):
    * fold one micro-batch of a user's events — sorted by event time — into
    * their funnel progress, emitting one row per step ADVANCED. A user
    * advances to step k+1 at the earliest step-(k+1) event strictly after
    * their step-k time, and (with `withinSecs`) no later than
    * `withinSecs` after their step-0 anchor — identical semantics to the
    * batch `EventAnalytics.funnel`, so the same conversion counts fall
    * out of `groupBy(step_idx).count` on the emitted rows.
    *
    * State is three longs per user who has entered the funnel (completed
    * users keep theirs so re-arrivals can't restart and double-count);
    * the [[streamingFunnel]] binding arms a timeout so expired/finished
    * users are evicted instead of living forever. */
  /** Full microsecond precision of a Timestamp — `getTime` alone truncates
    * to millis, which would diverge from the batch funnel's
    * microsecond-exact strictly-after comparison. */
  private def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  def funnelStep(uid: Long, events: Seq[FunnelEvent],
                 st0: Option[FunnelState], steps: Seq[String],
                 withinSecs: Option[Long]): (Option[FunnelState], Seq[FunnelOut]) = {
    val idx = steps.zipWithIndex.toMap
    var st = st0.getOrElse(FunnelState(-1, Long.MinValue, Long.MinValue))
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelOut]
    events.sortBy(e => (tsMicros(e.ts), idx.getOrElse(e.step, Int.MaxValue)))
      .foreach { e =>
        val micros = tsMicros(e.ts)
        val epoch = Math.floorDiv(micros, 1000000L)
        val wanted = st.stepIdx + 1
        // strictly-after at MICROsecond precision (lastEpoch holds µs),
        // matching the batch op; the window gate uses floored epoch
        // SECONDS, also matching the batch op
        if (wanted < steps.length && idx.get(e.step).contains(wanted) &&
            (st.stepIdx < 0 || micros > st.lastEpoch) &&
            withinSecs.forall(w => st.stepIdx < 0 || epoch <= st.anchorEpoch + w)) {
          val anchor = if (st.stepIdx < 0) epoch else st.anchorEpoch
          st = FunnelState(wanted, micros, anchor)
          out += FunnelOut(uid, wanted.toLong, e.step, epoch)
        }
      }
    // completed users KEEP their state (stepIdx = last) so re-arrivals
    // can't restart the funnel and double-count within the state horizon;
    // the timeout reclaims it. Users who never entered hold no state.
    val next = if (st.stepIdx < 0) None else Some(st)
    (next, out.toSeq)
  }

  /** E4-on-a-stream: per-user funnel progression via
    * `flatMapGroupsWithState` — one emitted row per (user, step reached),
    * append mode, so downstream `groupBy(step_idx)` IS the live funnel.
    * A ProcessingTimeTimeout of `stateTimeout` reclaims users who
    * finished or can no longer advance (the [[funnelStep]] contract keeps
    * completed users' state so they can't re-enter within the horizon). */
  def streamingFunnel(events: Dataset[FunnelEvent], steps: Seq[String],
                      withinSecs: Option[Long] = None,
                      stateTimeout: Option[String] = None): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val timeoutConf = stateTimeout.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.ProcessingTimeTimeout)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (next, out) = funnelStep(uid, rows.toSeq, state.getOption,
              steps, withinSecs)
            next match {
              case Some(st) =>
                state.update(st)
                stateTimeout.foreach(state.setTimeoutDuration)
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
        })
  }

  /** `idleTimeout`: with None, emission is purely event-driven — a key's
    * final session stays open in state until a later event closes it
    * (deterministic in tests). With Some(duration), a
    * ProcessingTimeTimeout is armed after every update; if a key sees no
    * data for that long, [[sessionFlush]] emits its open session and the
    * state is removed — final sessions emit and idle-key state is
    * reclaimed instead of living forever. The flush path's semantics are
    * spec-pinned via the pure functions (a wall-clock-driven streaming
    * test would be nondeterministic in CI). */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long,
                 idleTimeout: Option[String] = None): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timeoutConf = idleTimeout.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.ProcessingTimeTimeout)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (uid: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val (next, out) = sessionTimeout(uid, state.get)
            next match {
              case Some(tomb) =>
                state.update(tomb)
                idleTimeout.foreach(state.setTimeoutDuration)
              case None => state.remove()
            }
            out.iterator
          } else {
            val (st, out) = sessionStep(uid, rows.toSeq, state.getOption, gapSeconds)
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
        })
  }

  /** Stream-stream interval join (J8/J13 on unbounded inputs): attach to
    * every left event the right-stream events of the same key that land
    * inside `[left.ts, left.ts + windowSecs]` — the canonical Spark
    * stream-stream join, where BOTH sides are watermarked and the
    * time-bound condition is what lets the state store evict: a buffered
    * left row can stop waiting once the right watermark passes its
    * window end, and vice versa. Without the bound, both sides' state
    * would grow forever — this is the streaming form of the batch
    * rangeAttach/intervalJoin contract.
    *
    * Inputs need (`keyCol`, `tsCol`, payload) columns; emits one row per
    * matched pair in append mode (inner join: unmatched rows simply age
    * out). */
  def streamingIntervalJoin(left: DataFrame, right: DataFrame,
                            keyCol: String, tsCol: String,
                            windowSecs: Long,
                            watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(tsCol, watermarkDelay).alias("l")
    val r = right.withWatermark(tsCol, watermarkDelay).alias("r")
    l.join(r, expr(
      s"""l.$keyCol = r.$keyCol AND
         |r.$tsCol >= l.$tsCol AND
         |r.$tsCol <= l.$tsCol + interval $windowSecs seconds""".stripMargin))
      .select(col(s"l.$keyCol").as(keyCol),
        col(s"l.$tsCol").as("left_ts"),
        col(s"r.$tsCol").as("right_ts"))
  }

  // ---- D6 on a stream: online CUSUM changepoint ------------------------

  case class CusumEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class CusumState(s: Double, nSeen: Long)
  case class CusumAlarm(user_id: Long, ts_epoch: Long, stat: Double,
                        n_seen: Long)

  /** Pure per-key online CUSUM fold (the D6 recursion deployed as the
    * classic online detector): parameters (μ, κ, h) are FIXED — fitted
    * offline on a training window, exactly what the batch `Drift.cusum`
    * self-referenced form provisions — because a streaming detector must
    * not peek at the full series for its own mean. One alarm row is
    * emitted whenever s = max(0, s + x − μ − κ) crosses h, and the
    * statistic RESTARTS at 0 (the standard post-alarm reset, so repeated
    * alarms need fresh evidence). Events fold in (event-time, value)
    * order within the batch; state is two numbers per key. */
  def cusumStep(uid: Long, events: Seq[CusumEvent], st0: Option[CusumState],
                mu: Double, kappa: Double,
                h: Double): (Option[CusumState], Seq[CusumAlarm]) = {
    var st = st0.getOrElse(CusumState(0.0, 0L))
    val out = scala.collection.mutable.ArrayBuffer.empty[CusumAlarm]
    events.sortBy(e => (tsMicros(e.ts), e.value)).foreach { e =>
      val s1 = math.max(0.0, st.s + e.value - mu - kappa)
      val n1 = st.nSeen + 1
      if (s1 > h) {
        out += CusumAlarm(uid,
          Math.floorDiv(tsMicros(e.ts), 1000000L),
          graft.functions.Canon.roundDouble(s1, 6), n1)
        st = CusumState(0.0, n1)
      } else st = CusumState(s1, n1)
    }
    (if (st.nSeen == 0) None else Some(st), out.toSeq)
  }

  /** [[cusumStep]] bound as `flatMapGroupsWithState` in append mode —
    * one row per alarm, so `groupBy(user_id).count` over the sink IS the
    * live alarm census. `idleTimeout` reclaims keys that stop sending. */
  def streamingCusum(events: Dataset[CusumEvent], mu: Double, kappa: Double,
                     h: Double,
                     idleTimeout: Option[String] = None): Dataset[CusumAlarm] = {
    import events.sparkSession.implicits._
    val timeoutConf = idleTimeout.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.ProcessingTimeTimeout)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (uid: Long, rows: Iterator[CusumEvent], state: GroupState[CusumState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (next, out) = cusumStep(uid, rows.toSeq, state.getOption,
              mu, kappa, h)
            next match {
              case Some(st) =>
                state.update(st)
                idleTimeout.foreach(state.setTimeoutDuration)
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
        })
  }
}
