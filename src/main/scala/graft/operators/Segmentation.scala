package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization / segmentation operators (SURVEY.md §2.5 W4, §2.4 A19).
  *
  * The reference starts a new behavioral segment whenever the day sequence
  * has a gap (> 1 day) or crosses a month boundary
  * (`scripts/run_full_pipeline.py:664-708`,
  * `src/etl/stage_apply_labels.py:37-81`). That is the classic
  * gaps-and-islands pattern: a lag-based boundary flag, then a running sum
  * of flags as the island id.
  *
  * Scale note: the windows here are partitioned by an entity key
  * (participant / user). Per-entity sequences are bounded (years of daily
  * rows ≈ thousands), so each window sort is small and the whole operator
  * distributes by hash-partitioning on the entity key. A global
  * single-entity ordering (the reference's N-of-1 case) degenerates to one
  * partition — acceptable because that table is tiny by construction.
  */
object Segmentation {

  /** W4 — per-key sessionization on a timestamp gap: rows whose gap from
    * the previous row exceeds `maxGapSeconds` start a new session.
    * Output adds `session_id` (1-based per key). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 maxGapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    df.withColumn("gap_s",
        unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(w)))
      .withColumn("new_session",
        when(col("gap_s").isNull || col("gap_s") > maxGapSeconds, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("gap_s", "new_session")
  }

  /** W4 — date-grain segmentation with the reference's exact boundary
    * rules: new segment when day-gap > 1 OR month/year changes. Emits
    * per-row `segment_id` and `seg_reason` in {initial, gap, time_boundary}.
    * Reference: `scripts/run_full_pipeline.py:664-708`. */
  def segmentDays(daily: DataFrame, keyCol: String, dateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
    val prev = lag(col(dateCol), 1).over(w)
    daily
      .withColumn("seg_reason",
        when(prev.isNull, "initial")
          .when(datediff(col(dateCol), prev) > 1, "gap")
          .when(month(col(dateCol)) =!= month(prev) ||
                year(col(dateCol)) =!= year(prev), "time_boundary")
          .otherwise(null))
      .withColumn("segment_id",
        sum(when(col("seg_reason").isNotNull, 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Segment summary table: (key, segment_id, date_start, date_end, reason,
    * count, duration_days). Reference: `scripts/run_full_pipeline.py:704-708`. */
  def segmentTable(segmented: DataFrame, keyCol: String, dateCol: String): DataFrame =
    segmented
      .groupBy(col(keyCol), col("segment_id"))
      .agg(
        min(col(dateCol)).as("date_start"),
        max(col(dateCol)).as("date_end"),
        // the boundary row is the segment's first row; min_by gives its reason
        min_by(col("seg_reason"), col(dateCol)).as("reason"),
        count(lit(1)).as("cnt"))
      // long, not int: the DuckDB oracle's date_diff is BIGINT and the driver
      // gate hashes dtype-sensitively
      .withColumn("duration_days",
        (datediff(col("date_end"), col("date_start")) + 1).cast("long"))

  /** W9 — multi-rule auto-segmentation: a segment boundary opens when, in
    * priority order, (1) the day-gap from the previous row exceeds
    * `gapDays` ("gap-recovery"), or (2) the |Δ| between the current k-row
    * rolling mean of `signalCol` and the previous row's rolling mean
    * exceeds `deltaThreshold` AND the window is ≥ `minDensity` dense
    * (observed/k). One pass of window expressions + a `when` chain —
    * the reference's sequential rule precedence becomes column logic.
    * Reference: `src/labels/auto_segment.py:39-305`. */
  def autoSegment(daily: DataFrame, keyCol: String, dateCol: String,
                  signalCol: String, k: Int, deltaThreshold: Double,
                  minDensity: Double, gapDays: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
    val wRoll = w.rowsBetween(-(k - 1), 0)
    val prev = lag(col(dateCol), 1).over(w)
    val rollMean = avg(col(signalCol)).over(wRoll)
    val density = count(col(signalCol)).over(wRoll).cast("double") / k
    val withRules = daily
      .withColumn("__roll", rollMean)
      .withColumn("__dens", density)
      .withColumn("seg_reason",
        when(prev.isNull, "initial")
          .when(datediff(col(dateCol), prev) > gapDays, "gap_recovery")
          .when(col("__dens") >= minDensity &&
            abs(col("__roll") - lag(col("__roll"), 1).over(w)) > deltaThreshold,
            "delta_shift")
          .otherwise(null))
    withRules
      .withColumn("segment_id",
        sum(when(col("seg_reason").isNotNull, 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__roll", "__dens")
  }

  /** A15 — temporal instability score: per feature, the variance ACROSS
    * per-segment means, normalized by the max across features (driver-side
    * normalize of a #features-sized vector, mirroring the reference's
    * two-phase structure). Reference: `src/utils/temporal_instability
    * .py:67-143`. Input must already carry `segment_id`. */
  def instabilityScores(segmented: DataFrame, features: Seq[String]): DataFrame = {
    val meanAggs = features.map(f => avg(col(f)).as(s"m_$f"))
    val perSegment = segmented.groupBy(col("segment_id"))
      .agg(meanAggs.head, meanAggs.tail: _*)
    val varAggs = features.map(f => var_samp(col(s"m_$f")).as(s"v_$f"))
    val varsRow = perSegment.agg(varAggs.head, varAggs.tail: _*).head()
    val raw = features.zipWithIndex.map { case (f, i) =>
      f -> (if (varsRow.isNullAt(i)) 0.0 else varsRow.getDouble(i))
    }
    val maxVar = raw.map(_._2).max
    val spark = segmented.sparkSession
    import spark.implicits._
    raw.toDF("feature", "variance")
      .withColumn("instability",
        when(lit(maxVar) > 0, graft.functions.Canon.round(col("variance") / lit(maxVar), 6))
          .otherwise(lit(0.0)))
      .withColumn("variance", graft.functions.Canon.round(col("variance"), 6))
  }

  /** A19/Q4 — consecutive-run (gaps-and-islands) stats: per key, flag rows
    * matching `flagCol` (0/1), find maximal runs of consecutive flagged
    * rows (consecutive = adjacent in `orderCol` order), and report the
    * number of runs >= `minRun` and the longest run.
    * Reference: `src/biomarkers/activity.py:176-288`. */
  def runStats(df: DataFrame, keyCol: String, orderCol: String, flagCol: String,
               minRun: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    // run id = row_number - running count of flagged rows: constant within
    // each maximal run of flagged rows.
    val runs = df
      .withColumn("rn", row_number().over(w))
      .withColumn("cf", sum(col(flagCol)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col(flagCol) === 1)
      .withColumn("grp", col("rn") - col("cf"))
      .groupBy(col(keyCol), col("grp"))
      .agg(count(lit(1)).as("run_len"))
    runs
      .groupBy(col(keyCol))
      .agg(
        sum(when(col("run_len") >= minRun, 1).otherwise(0)).as("n_long_runs"),
        max(col("run_len")).as("max_run"),
        count(lit(1)).as("n_runs"))
  }
}
