package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
