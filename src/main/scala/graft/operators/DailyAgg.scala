package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon.round

/** Event-to-daily aggregation operators (SURVEY.md §2.4 A1-A11).
  *
  * The reference pipeline (rodrigomarquest/practicum2-nof1-adhd-bd)
  * collapses raw wearable events — `(timestamp, value)` at second/minute
  * grain — to one row per calendar day. Each method here is the
  * Spark-native generalization: a pure `DataFrame => DataFrame`
  * transformation with explicit grouping keys, so it distributes by
  * hash-partitioning on the group key and benefits from partial (map-side)
  * aggregation automatically. No collect-to-driver anywhere.
  *
  * Reference semantics pinned per call site:
  *  - daily HR stats use POPULATION std (numpy ddof=0),
  *    `src/etl/stage_csv_aggregation.py:418-431`.
  *  - Zepp HR std uses SAMPLE std (pandas default ddof=1), `:937-941`.
  *  - HRV median is an exact percentile, `:611-624` — `percentile`, never
  *    `approx_percentile`, so a DuckDB `quantile_cont` oracle matches.
  */
object DailyAgg {

  /** Biological outlier filter (F2/F3): keep lo <= value <= hi.
    * Reference: `src/etl/stage_csv_aggregation.py:272-273,337-342`. */
  def outlierFilter(df: DataFrame, valueCol: String, lo: Double, hi: Double): DataFrame =
    df.filter(col(valueCol).between(lo, hi))

  /** A2 — daily stats over an event stream: mean/min/max/population-std/count.
    * Reference: `src/etl/stage_csv_aggregation.py:418-431`. */
  def dailyStats(events: DataFrame, tsCol: String, valueCol: String): DataFrame =
    dailyStatsBy(events, to_date(col(tsCol)), valueCol)

  /** [[dailyStats]] grouped by an explicit date expression — the reference
    * keeps LOCAL wall-clock dates for Apple XML records (offset preserved
    * in the source, stripped before dating), so composed pipelines pass
    * `col("wall_date")` instead of a UTC `to_date(ts)`. */
  def dailyStatsBy(events: DataFrame, dateExpr: Column, valueCol: String): DataFrame =
    events
      .groupBy(dateExpr.as("date"))
      .agg(
        avg(col(valueCol)).as("v_mean"),
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"),
        stddev_pop(col(valueCol)).as("v_std"),
        count(col(valueCol)).as("n_samples"))

  /** A3/A6 — daily exact median + p95 (HRV-style stats).
    * Reference: `src/etl/stage_csv_aggregation.py:611-624`,
    * `src/domains/parse_zepp_export.py:103-108`. */
  def dailyPercentiles(events: DataFrame, tsCol: String, valueCol: String): DataFrame =
    dailyPercentilesBy(events, to_date(col(tsCol)), valueCol)

  /** [[dailyPercentiles]] grouped by an explicit date expression (see
    * [[dailyStatsBy]] for why wall-clock dates matter). */
  def dailyPercentilesBy(events: DataFrame, dateExpr: Column, valueCol: String): DataFrame =
    events
      .groupBy(dateExpr.as("date"))
      .agg(
        avg(col(valueCol)).as("v_mean"),
        percentile(col(valueCol), lit(0.5)).as("v_median"),
        percentile(col(valueCol), lit(0.95)).as("v_p95"),
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"),
        count(col(valueCol)).as("n"))

  /** A7 — meds-style daily rollup: event count, dose sum, any-flag, and a
    * deterministic comma-joined sorted distinct name list.
    * Reference: `src/domains/meds/meds_from_extracted.py:324-342`. */
  def dailyNamedEvents(events: DataFrame, tsCol: String, nameCol: String,
                       doseCol: String): DataFrame =
    events
      .groupBy(to_date(col(tsCol)).as("date"))
      .agg(
        count(lit(1)).as("event_count"),
        round(sum(col(doseCol)), 6).as("dose_total"),
        array_join(array_sort(collect_set(col(nameCol))), ", ").as("names"))
      .withColumn("any_flag", when(col("event_count") > 0, 1).otherwise(0))

  /** A8 — state-of-mind-style daily rollup: mean score, LAST score by
    * timestamp (deterministic tie-break on the value itself), entry count,
    * and a ±threshold 3-class label on the mean.
    * Reference: `src/domains/som/som_from_autoexport.py:308-390`;
    * thresholds `:96-99`. */
  def dailyLastAndMean(events: DataFrame, keyCols: Seq[String], tsCol: String,
                       valueCol: String, hiThreshold: Double,
                       loThreshold: Double): DataFrame = {
    val v = col(valueCol)
    events
      .groupBy(keyCols.map(col) :+ to_date(col(tsCol)).as("date"): _*)
      .agg(
        round(avg(v), 6).as("mean_score"),
        // max_by with a composite (ts, value) struct: deterministic even if
        // two events share a timestamp.
        max_by(v, struct(col(tsCol), v)).as("last_score"),
        count(lit(1)).as("n_entries"))
      .withColumn("category_3class",
        when(col("mean_score") >= hiThreshold, 1)
          .when(col("mean_score") <= loThreshold, -1)
          .otherwise(0))
  }

  /** A9 — pivot a category column to per-category daily sums. Categories
    * must be pinned (explicit list) so the output schema is static — at
    * 100 TB a dynamic pivot would need an extra distinct-scan job.
    * Reference: `src/domains/sleep/sleep_from_extracted.py:402-432`. */
  def dailyPivotSum(events: DataFrame, tsCol: String, catCol: String,
                    valueCol: String, categories: Seq[String]): DataFrame =
    events
      .groupBy(to_date(col(tsCol)).as("date"))
      .pivot(catCol, categories)
      .agg(round(sum(valueCol), 6))

  /** A1 — conditional split-sum: the sleep asleep-vs-inbed pattern. Sums
    * `valueCol` into one bucket per predicate, then a clipped ratio score.
    * Reference: `src/etl/stage_csv_aggregation.py:162-215`. */
  def conditionalSplitSum(events: DataFrame, tsCol: String, valueCol: String,
                          predA: Column, predB: Column): DataFrame = {
    val sumA = sum(when(predA, col(valueCol)).otherwise(lit(0.0)))
    val sumB = sum(when(predB, col(valueCol)).otherwise(lit(0.0)))
    events
      .groupBy(to_date(col(tsCol)).as("date"))
      .agg(round(sumA, 6).as("sum_a"), round(sumB, 6).as("sum_b"))
      .withColumn("ratio_score",
        when(col("sum_b") > 0,
          least(greatest(col("sum_a") / col("sum_b") * 100.0, lit(0.0)), lit(100.0)))
          .otherwise(lit(null)))
  }

  /** A16 — circadian hourly-bucket stats: per day, the fraction of daily
    * total falling in a nocturnal window (22:00-06:00), the peak hour
    * (arg-max of hourly sum, ties broken toward the EARLIEST hour), and an
    * early-morning (04:00-08:00) fraction.
    * Reference: `src/biomarkers/circadian.py:92-133`.
    * Two-level aggregation: (date,hour) partial sums first — the second
    * level is 24 rows per day, so the heavy shuffle happens once. */
  def circadianStats(events: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val hourly = events
      .groupBy(to_date(col(tsCol)).as("date"), hour(col(tsCol)).as("hr"))
      .agg(sum(col(valueCol)).as("hsum"))
    hourly
      .groupBy("date")
      .agg(
        round(sum("hsum"), 6).as("total"),
        round(sum(when(col("hr") >= 22 || col("hr") < 6, col("hsum")).otherwise(0.0)), 6)
          .as("nocturnal_sum"),
        round(sum(when(col("hr") >= 4 && col("hr") < 8, col("hsum")).otherwise(0.0)), 6)
          .as("early_sum"),
        // arg-max with deterministic tie-break: max over (sum, -hour).
        max_by(col("hr"), struct(col("hsum"), -col("hr"))).cast("long").as("peak_hour"))
      .select(
        col("date"),
        round(when(col("total") > 0, col("nocturnal_sum") / col("total") * 100.0)
          .otherwise(lit(null)), 6).as("nocturnal_pct"),
        round(when(col("total") > 0, col("early_sum") / col("total") * 100.0)
          .otherwise(lit(null)), 6).as("early_pct"),
        col("peak_hour"),
        col("total"))
  }

  /** A17 — HRV-style successive-difference biomarkers over an ordered
    * per-day series: SDNN (sample std), RMSSD (root-mean-square of
    * successive diffs), pNN50 (% of |diff| > threshold), CV.
    * Ordered diffs come from a lag window partitioned BY DAY — each day's
    * window sorts only its own events, so the sort is bounded and
    * distributes across days. Reference: `src/biomarkers/hrv.py:28-170`. */
  def successiveDiffStats(events: DataFrame, tsCol: String, valueCol: String,
                          diffThreshold: Double, minCount: Int): DataFrame = {
    val day = to_date(col(tsCol))
    val w = Window.partitionBy(day).orderBy(col(tsCol), col(valueCol))
    val withDiff = events
      .withColumn("date", day)
      .withColumn("d", col(valueCol) - lag(col(valueCol), 1).over(w))
    withDiff
      .groupBy("date")
      .agg(
        count(col(valueCol)).as("n"),
        round(stddev_samp(col(valueCol)), 6).as("sdnn"),
        round(sqrt(avg(col("d") * col("d"))), 6).as("rmssd"),
        // pNN denominator = number of DIFFS (n-1), not rows: the first
        // row's null diff must stay null so avg excludes it.
        round(avg(when(abs(col("d")) > diffThreshold, 1.0)
          .when(col("d").isNotNull, 0.0)) * 100.0, 6).as("pnn"),
        round(stddev_samp(col(valueCol)) / avg(col(valueCol)) * 100.0, 6).as("cv"))
      .filter(col("n") >= minCount)
  }

  /** A18 — activity variance / peaks / fragmentation: per day over event
    * intensities — std, mean, count of events above mean+std ("peaks"),
    * and the zero/nonzero fragmentation ratio. The peak count needs the
    * day's own mean/std, so it's a TWO-PHASE aggregation: day stats first,
    * broadcast-join back, then the conditional count — never a correlated
    * subquery per row. Reference: `src/biomarkers/activity.py:92-173`. */
  def activityStats(events: DataFrame, tsCol: String, valueCol: String,
                    zeroThreshold: Double): DataFrame = {
    val v = col(valueCol)
    val day = to_date(col(tsCol)).as("date")
    val stats = events.groupBy(day)
      .agg(avg(v).as("__mean"), stddev_samp(v).as("__std"),
        count(lit(1)).as("n_events"))
    val joined = events.select(to_date(col(tsCol)).as("date"), v.as("__v"))
      .join(broadcast(stats), Seq("date"))
    joined.groupBy("date")
      .agg(
        round(first("__mean"), 6).as("v_mean"),
        round(first("__std"), 6).as("v_std"),
        first("n_events").as("n_events"),
        sum(when(col("__v") > col("__mean") + col("__std"), 1).otherwise(0))
          .as("n_peaks"),
        round(sum(when(col("__v") <= zeroThreshold, 1).otherwise(0)).cast("double") /
          count(lit(1)), 6).as("sedentary_ratio"))
  }

  /** A22 — overnight day classification: for each day, count signal
    * presence in the overnight window (22:00 previous day → 08:00) for two
    * channels, then classify normal / sleepless / sensor_missing /
    * ambiguous with a `when` chain.
    * Reference: `src/etl/sleep_hourly_audit.py:400-467`. */
  def classifyDays(events: DataFrame, tsCol: String, isChannelA: Column,
                   isChannelB: Column): DataFrame = {
    // shift by 2h so 22:00..23:59 counts toward the NEXT calendar day,
    // then keep hours up to 08:00 (shifted 0..10).
    val shifted = col(tsCol) + expr("INTERVAL 2 HOURS")
    val overnight = events
      .filter(hour(shifted) < 10)
      .groupBy(to_date(shifted).as("date"))
      .agg(
        sum(when(isChannelA, 1).otherwise(0)).as("n_a"),
        sum(when(isChannelB, 1).otherwise(0)).as("n_b"))
    overnight.withColumn("day_class",
      when(col("n_a") > 0 && col("n_b") > 0, "normal")
        .when(col("n_a") === 0 && col("n_b") > 0, "sleepless")
        .when(col("n_a") === 0 && col("n_b") === 0, "sensor_missing")
        .otherwise("ambiguous"))
  }

  /** A20 — distribution stats: per-category counts and percentages. */
  def distribution(df: DataFrame, catCol: String): DataFrame = {
    val total = sum(col("cnt")).over(Window.partitionBy())
    df.groupBy(col(catCol))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("pct", round(col("cnt") / total * 100.0, 6))
  }
}
