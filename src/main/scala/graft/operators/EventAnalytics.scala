package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon.round

/** Large-scale event-analytics operators beyond the reference's daily
  * pipeline: cohort retention and ordered funnels — the queries an events
  * table this shape exists to answer at cluster scale.
  *
  * Both are pure equi-join/aggregate plans: retention shuffles on the user
  * key twice (first-seen, then the cohort attach, co-partitioned by AQE)
  * and ends in a tiny (cohort, offset) aggregate; the funnel is a chain of
  * `steps.length` per-user min-aggregations, each an equi-join on the user
  * key against an already-user-unique frame — no windows over the whole
  * event stream, no range joins, so both survive a 100× scale-up with the
  * same plan shapes.
  */
object EventAnalytics {

  /** Weekly cohort retention: users are cohorted by the Monday-truncated
    * week of their first-seen date; for each (cohort_week, week_offset)
    * count the distinct users active that week and their fraction of the
    * cohort. `week_offset = floor(days_since_first_seen / 7)`, so offset 0
    * always contains the full cohort.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = events.select(col(userCol), to_date(col(tsCol)).as("date"))
    val first = days.groupBy(userCol).agg(min("date").as("first_date"))
    val cohorts = first
      .groupBy(to_date(date_trunc("week", col("first_date"))).as("cohort_week"))
      .agg(count(lit(1)).as("cohort_n"))
    val active = days.join(first, Seq(userCol))
      .select(
        to_date(date_trunc("week", col("first_date"))).as("cohort_week"),
        floor(datediff(col("date"), col("first_date")) / 7).as("week_offset"),
        col(userCol))
      .distinct()
    active.groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(cohorts, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        round(col("n_active").cast("double") / col("cohort_n"), 6).as("retention"))
  }

  /** Rolling active users: per event date, the exact distinct-user count
    * that day (DAU), over the trailing `windowDays` window (WAU), and
    * their ratio (stickiness). Exact distinct over a sliding window has
    * no window-function form (count distinct isn't windowable) and the
    * naive self-join explodes by the window in ROWS; instead each
    * (user, day) contributes to the `windowDays` window-END dates it can
    * be active in — a BOUNDED explode (× windowDays) followed by plain
    * distinct + count equi-shuffles, so the plan scales linearly in the
    * event-day table at any corpus size. Only dates that actually occur
    * in the data are emitted (inner join with the DAU frame).
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int = 7): DataFrame = {
    // sequence(0, windowDays-1) with windowDays <= 0 would silently step
    // BACKWARD (a leading window) instead of failing
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val days = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d")).distinct()
    val dau = days.groupBy(col("d").as("date")).agg(count(lit(1)).as("dau"))
    val wau = days
      .select(col("u"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("o"), col("d"))
      .select(col("u"), date_add(col("d"), col("o")).as("date"))
      .distinct()
      .groupBy("date").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("date"))
      .select(col("date"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
  }

  /** Session path analysis: sessionize each user's stream on an
    * inactivity gap, build the ordered event-type path of each session
    * (truncated to the first `maxPathEvents` events — bounded per-session
    * state, the cap a 100-TB run needs against degenerate bot sessions),
    * and aggregate to one row per distinct path with session count and
    * mean session length. Ordering is total — (ts, tieCol, typeCol) — so
    * the path string AND the truncation boundary are deterministic even
    * when (ts, tieCol) is not unique.
    *
    * Plan shape: one shuffle on the user key for the session window, one
    * shuffle on (user, session) for the per-session collect, one on the
    * path string for the final count — all equi-shuffles, no global sort.
    * The collect_list is per-session and truncated, so executor memory is
    * bounded by `maxPathEvents`, not by session length.
    */
  def sessionPaths(events: DataFrame, userCol: String, tsCol: String,
                   tieCol: String, typeCol: String, gapSecs: Long,
                   maxPathEvents: Int = 8): DataFrame = {
    require(gapSecs >= 1, s"gapSecs must be >= 1, got $gapSecs")
    require(maxPathEvents >= 1, s"maxPathEvents must be >= 1, got $maxPathEvents")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val sess = events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          col(tsCol).cast("long") - col("prev_ts").cast("long") > gapSecs, 1)
          .otherwise(0))
      .withColumn("sess", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    // rank within the session FIRST so the collect only ever buffers
    // maxPathEvents structs per group (collect_list skips the nulls the
    // `when` produces past the cap) — a 10M-event bot session costs the
    // aggregation buffer 8 entries, not 10M. count(*) still sees every row.
    // rank order includes the type column as a final tiebreak so the
    // kept-vs-dropped choice at the truncation boundary stays
    // deterministic even when (ts, tieCol) is not unique — matching the
    // (t, k, e) struct sort below
    val wSess = Window.partitionBy(col(userCol), col("sess"))
      .orderBy(col(tsCol), col(tieCol), col(typeCol))
    // The path is assembled from maxPathEvents SLOT aggregates
    // (max(when(rk = i, type)) — exactly one row per slot, empty slots
    // null and skipped by concat_ws), NOT a collect_list of structs:
    // collect_list runs on ObjectHashAggregate, which falls back to
    // SORT-based aggregation past a small in-memory key threshold — at
    // this fixture's gap density sessions ~ events (19M groups at 20M
    // events), and the measured third-decade profile put 4.4 of e6's
    // 9.8 s in that fallback sort. Slot maxes keep the aggregation a
    // codegen HashAggregate with map-side combine; the output string is
    // identical because rk IS the (ts, tie, type) sort order the old
    // array_sort reproduced.
    val perSession = sess
      .withColumn("rk", row_number().over(wSess))
      .groupBy(col(userCol), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        concat_ws(">", (1 to maxPathEvents).map(i =>
          max(when(col("rk") === i, col(typeCol)))): _*).as("path"))
    perSession.groupBy("path")
      .agg(count(lit(1)).as("n_sessions"),
        round(avg(col("n_events")), 6).as("avg_events"))
  }

  /** Event-type transition matrix: within each inactivity-gap session,
    * count consecutive (src -> dst) event-type pairs and attach the
    * per-src transition probability — the first-order Markov view of the
    * event stream. The lead() runs over the same per-user window the
    * sessionizer used; the probability attach is a window over the
    * aggregated (src, dst) frame, whose cardinality is bounded by
    * |event_type|^2, not by the data.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, typeCol: String, gapSecs: Long): DataFrame = {
    require(gapSecs >= 1, s"gapSecs must be >= 1, got $gapSecs")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("dst", lead(col(typeCol), 1).over(w))
      .withColumn("next_ts", lead(col(tsCol), 1).over(w))
      .filter(col("dst").isNotNull &&
        col("next_ts").cast("long") - col(tsCol).cast("long") <= gapSecs)
      .select(col(typeCol).as("src"), col("dst"))
    val counts = pairs.groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val srcW = Window.partitionBy("src")
    counts
      .withColumn("p", round(col("n").cast("double") / sum("n").over(srcW), 6))
      .select("src", "dst", "n", "p")
  }

  /** e9 — Kaplan-Meier survival estimate of time-to-first-`eventType`:
    * every user enters at their first event; users who never reach the
    * target event are right-censored at the corpus end date. Standard KM
    * at-equal-times convention: events precede censorings, i.e. both
    * reduce the risk set only for LATER durations.
    *
    * One row per distinct duration with at least one leaver: d (events),
    * c (censored), n (risk set), and S(t) = Π_{t_i <= t} (1 - d_i/n_i)
    * computed as exp of the running sum of ln(1 - d/n) — the cumulative
    * window runs over DISTINCT DURATIONS, whose cardinality is bounded by
    * the observation span in days (time, not users), so the
    * single-partition window is bounded by contract at any corpus size;
    * everything before it is per-user equi-aggregation.
    */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, eventType: String): DataFrame = {
    val perUser = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("first_date"),
        min(when(col(typeCol) === eventType, to_date(col(tsCol))))
          .as("event_date"))
    val corpusEnd = events.agg(max(to_date(col(tsCol))).as("corpus_end"))
    val durations = perUser.crossJoin(broadcast(corpusEnd))
      .select(
        when(col("event_date").isNotNull,
          datediff(col("event_date"), col("first_date")))
          .otherwise(datediff(col("corpus_end"), col("first_date")))
          .cast("long").as("t"),
        when(col("event_date").isNotNull, 1L).otherwise(0L).as("event"))
    val grouped = durations.groupBy("t")
      .agg(sum(col("event")).as("d"),
        sum(lit(1L) - col("event")).as("c"),
        count(lit(1)).as("leavers"))
    val total = grouped.agg(sum("leavers").as("n_total"))
    val w = Window.orderBy(col("t"))
    val wPrior = w.rowsBetween(Window.unboundedPreceding, -1)
    // d = n empties the risk set: ln(0) is null in Spark (a windowed sum
    // would silently SKIP it) and an error in DuckDB — S(t) hits exactly
    // 0 there and stays 0, so both engines take the explicit-zero branch
    // and only sum ln over d < n rows.
    val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
    grouped.crossJoin(broadcast(total))
      .withColumn("n",
        col("n_total") - coalesce(sum(col("leavers")).over(wPrior), lit(0L)))
      .withColumn("zeroed",
        max(when(col("d") === col("n"), 1).otherwise(0)).over(wCum))
      .withColumn("survival",
        when(col("zeroed") === 1, 0.0).otherwise(
          round(exp(sum(when(col("d") < col("n"),
              log(lit(1.0) - col("d").cast("double") / col("n")))
              .otherwise(lit(0.0))).over(wCum)), 6)))
      .select(col("t"), col("d"), col("c"), col("n"), col("survival"))
  }

  /** RFM segmentation: per-user recency (days since last event, vs the
    * corpus max date), frequency (event count), monetary (summed value of
    * `purchaseType` events), each scored 1-4 by exact quartile boundaries.
    *
    * Scale note: the textbook formulation is `ntile(4)` over three global
    * sorts — three single-partition exchanges, the anti-pattern PlanAudit
    * rejects. Instead the quartile boundaries are ONE 1-row exact
    * percentile aggregate broadcast back (the repo's global-stat pattern),
    * and scoring is a per-row comparison — no global sort at any size.
    * Boundaries are canonically rounded so the bucket edges are
    * cross-engine identical.
    */
  def rfm(events: DataFrame, userCol: String, tsCol: String,
          typeCol: String, valueCol: String, purchaseType: String): DataFrame = {
    val perUser = events
      .groupBy(col(userCol))
      .agg(max(to_date(col(tsCol))).as("last_date"),
        count(lit(1)).as("frequency"),
        round(sum(when(col(typeCol) === purchaseType, col(valueCol))
          .otherwise(0.0)), 6).as("monetary"))
    val maxDate = events.agg(max(to_date(col(tsCol))).as("corpus_max"))
    val withR = perUser.crossJoin(broadcast(maxDate))
      .withColumn("recency_days",
        datediff(col("corpus_max"), col("last_date")).cast("long"))
      .drop("corpus_max", "last_date")
    val qs = withR.agg(
      round(percentile(col("recency_days"), lit(0.25)), 6).as("r25"),
      round(percentile(col("recency_days"), lit(0.5)), 6).as("r50"),
      round(percentile(col("recency_days"), lit(0.75)), 6).as("r75"),
      round(percentile(col("frequency"), lit(0.25)), 6).as("f25"),
      round(percentile(col("frequency"), lit(0.5)), 6).as("f50"),
      round(percentile(col("frequency"), lit(0.75)), 6).as("f75"),
      round(percentile(col("monetary"), lit(0.25)), 6).as("m25"),
      round(percentile(col("monetary"), lit(0.5)), 6).as("m50"),
      round(percentile(col("monetary"), lit(0.75)), 6).as("m75"))
    def bucketAsc(c: Column, q1: Column, q2: Column, q3: Column): Column =
      when(c <= q1, 4).when(c <= q2, 3).when(c <= q3, 2).otherwise(1)
    def bucketDesc(c: Column, q1: Column, q2: Column, q3: Column): Column =
      when(c <= q1, 1).when(c <= q2, 2).when(c <= q3, 3).otherwise(4)
    withR.crossJoin(broadcast(qs))
      .withColumn("r_score",
        bucketAsc(col("recency_days"), col("r25"), col("r50"), col("r75")))
      .withColumn("f_score",
        bucketDesc(col("frequency"), col("f25"), col("f50"), col("f75")))
      .withColumn("m_score",
        bucketDesc(col("monetary"), col("m25"), col("m50"), col("m75")))
      .withColumn("rfm_cell",
        concat(col("r_score"), col("f_score"), col("m_score")))
      .withColumn("segment",
        when(col("r_score") >= 3 && col("f_score") >= 3 && col("m_score") >= 3,
          "champion")
          .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
          .when(col("f_score") <= 2 && col("m_score") <= 2, "low_value")
          .otherwise("regular"))
      .select(col(userCol), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        col("rfm_cell"), col("segment"))
  }

  /** Ordered funnel: how many users performed `steps` in strict timestamp
    * order (each step strictly after their earliest qualifying occurrence
    * of the previous step). One row per step with the surviving user count.
    * With `withinSecs`, later steps must also land within that window of
    * the user's step-0 anchor time (conversion-window semantics).
    *
    * The classic formulation: stage 0 is `min(ts)` per user over step-0
    * events; stage k joins step-k events to the stage-(k-1) frame on the
    * user key and keeps `min(ts)` of those strictly later. The loop is
    * driver-side plan construction only — data never leaves the cluster,
    * and each stage's frame is user-unique so the joins stay 1:N
    * equi-joins on the user key.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             withinSecs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stages = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val hits = events.filter(col(typeCol) === step)
        val reached = prev match {
          case None =>
            hits.groupBy(userCol).agg(min(col(tsCol)).as("t"))
              .withColumn("t0", col("t"))
          case Some(p) =>
            val gate = withinSecs.fold(lit(true))(w =>
              col(tsCol).cast("long") <= col("t0").cast("long") + w)
            hits.join(p.select(col(userCol), col("t").as("prev_t"), col("t0")),
                Seq(userCol))
              .filter(col(tsCol) > col("prev_t") && gate)
              .groupBy(userCol).agg(min(col(tsCol)).as("t"), min("t0").as("t0"))
        }
        Some(reached)
    }.flatten
    steps.zip(stages).zipWithIndex.map { case ((step, reached), i) =>
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("step_idx"), lit(step).as("step"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Last-touch conversion attribution: each `convType` event is credited
    * to the user's most recent PRECEDING `touchTypes` event, provided it
    * happened within `windowSecs`; conversions with no in-window touch
    * are `organic`. Emits per-channel conversion counts and revenue —
    * the classic marketing-attribution rollup (first/linear variants are
    * frame tweaks of the same window).
    *
    * One window pass per user timeline (hash-partitioned on the user
    * key, ordered by (ts, idCol) so simultaneous events attribute
    * deterministically) + one aggregation on the tiny channel key. The
    * touch lookup is `last(..., ignoreNulls)` over the strictly-
    * preceding frame — no self-join, no per-conversion range scan. */
  def lastTouchAttribution(events: DataFrame, userCol: String, idCol: String,
                           tsCol: String, typeCol: String, valueCol: String,
                           touchTypes: Seq[String], convType: String,
                           windowSecs: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val touched = events
      .withColumn("__touch_ts",
        last(when(isTouch, col(tsCol)), ignoreNulls = true).over(w))
      .withColumn("__touch_type",
        last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w))
    touched.filter(col(typeCol) === convType)
      .withColumn("attr_type",
        when(col("__touch_ts").isNull ||
            unix_timestamp(col(tsCol)) - unix_timestamp(col("__touch_ts")) >
              windowSecs, lit("organic"))
          .otherwise(col("__touch_type")))
      .groupBy("attr_type")
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(col(valueCol)), 6).as("revenue"))
  }
}
