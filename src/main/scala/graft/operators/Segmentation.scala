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

  /** W9 — columnar multi-signal auto-segmentation: per key, a boundary
    * opens (priority order) on (1) gap recovery — current row observed
    * after `gapMin` consecutive both-missing rows — or (2) the first
    * signal in `signals` whose |mean(next k rows) - mean(prev k rows)|
    * >= its threshold with both windows >= `minDensity` dense (count/k).
    * Pure window expressions — one shuffle on the key; per-key sequences
    * are bounded (daily grain), so every window sort is small.
    * `signals` = (column, threshold, reasonLabel) in priority order,
    * mirroring the reference's HR >= 8 bpm, HRV >= 10 ms,
    * sleep-eff >= 0.08 chain (`src/labels/auto_segment.py:66-145`);
    * the loop-exact reference semantics live in [[autoSegmentFull]]. */
  def multiSignalSegments(daily: DataFrame, keyCol: String, dateCol: String,
                          signals: Seq[(String, Double, String)], k: Int,
                          minDensity: Double, gapMin: Int,
                          missingCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
    val wPrev = w.rowsBetween(-k, -1)
    val wCurr = w.rowsBetween(0, k - 1)
    val rn = row_number().over(w)
    val gapCond = col(missingCol) === 0 &&
      (1 to gapMin).map(g => lag(col(missingCol), g).over(w) === 1).reduce(_ && _)
    val signalCases = signals.map { case (c, thr, label) =>
      val densPrev = count(col(c)).over(wPrev).cast("double") / k
      val densCurr = count(col(c)).over(wCurr).cast("double") / k
      (densPrev >= minDensity && densCurr >= minDensity &&
        abs(avg(col(c)).over(wCurr) - avg(col(c)).over(wPrev)) >= thr, label)
    }
    val reason = signalCases.foldLeft(
      when(rn > gapMin && gapCond, "gap_recovery")) {
      case (acc, (cond, label)) => acc.when(rn > k && cond, label)
    }
    daily
      .withColumn("seg_reason", reason.otherwise(null))
      .withColumn("segment_id",
        (sum(when(col("seg_reason").isNotNull, 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)) + 1).cast("long"))
  }

  /** W9 — the reference's EXACT `generate_segments` loop
    * (`src/labels/auto_segment.py:211-305`), row-identical against the
    * actual implementation (tools/reference_parity.py `autoseg`):
    * per row, in priority order — temporal fallback (>= `temporalPeriod`
    * days since the last boundary), gap recovery (`gapMin` both-missing
    * rows then an observed row), signal change (the reference's
    * slice-truncated 2x`signalWindow` scan: HR >= 8 bpm, HRV >= 10 ms,
    * sleep-eff >= 0.08, each only if no earlier signal triggered anywhere
    * in the slice, densities >= 0.7), source change (pandas-mode dominant
    * source over the reference's label-INCLUSIVE +-`sourceWindow` slices).
    *
    * The resolution is inherently sequential per participant (temporal
    * fallback depends on the previous boundary date), so it runs as a
    * per-key group walk — distributed across keys; per-key daily history
    * is bounded by construction (same scaling argument as D1 ADWIN,
    * SURVEY §2.12). Output: key, date, segment_id (1-based), reason,
    * metric (null when no boundary; metric mirrors the reference's
    * decision-log strings). */
  def autoSegmentFull(daily: DataFrame, keyCol: String, dateCol: String,
                      sourceWindow: Int = 5, signalWindow: Int = 7,
                      gapMin: Int = 3, temporalPeriod: Int = 60): DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    val has = daily.columns.toSet
    def optD(name: String) =
      (if (has(name)) col(name).cast("double") else lit(null).cast("double")).as(name)
    def optS(name: String) =
      (if (has(name)) col(name).cast("string") else lit(null).cast("string")).as(name)
    val hasMissing = has("missing_cardio") && has("missing_sleep")
    val hasSource = has("source_cardio")
    val sigEnabled = Array(has("hr_mean"), has("hrv_rmssd"), has("sleep_efficiency"))
    val prepared = daily.select(col(keyCol).cast("string").as("k"),
      col(dateCol).cast("date").as("d"), optD("hr_mean"), optD("hrv_rmssd"),
      optD("sleep_efficiency"), optS("source_cardio"), optD("missing_cardio"),
      optD("missing_sleep"))
    val thresholds = Array(8.0, 10.0, 0.08)
    val sigNames = Array("HR_mean_change", "HRV_change", "SleepEff_change")
    val sigUnits = Array("bpm", "ms", "")
    val sigDigits = Array(1, 1, 2)

    prepared.as[(String, java.sql.Date, Option[Double], Option[Double],
        Option[Double], Option[String], Option[Double], Option[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2.getTime)
        val n = rows.length
        val dates = rows.map(_._2.toLocalDate)
        val sig: Array[Array[Option[Double]]] =
          Array(rows.map(_._3), rows.map(_._4), rows.map(_._5))
        val srcRaw: Array[Option[String]] = rows.map(_._6)
        val missing: Array[Boolean] =
          rows.map(r => hasMissing && r._7.contains(1.0) && r._8.contains(1.0))

        // pandas Series.mode(): drop NaN, max count, ties -> smallest value
        def mode(lo: Int, hi: Int): Option[String] = { // inclusive bounds
          val vals = (lo to hi).flatMap(srcRaw(_))
          if (vals.isEmpty) None
          else {
            val counts = vals.groupBy(identity).view.mapValues(_.size)
            val maxC = counts.values.max
            Some(counts.filter(_._2 == maxC).keys.min)
          }
        }

        def meanOpt(vs: Seq[Option[Double]]): Option[Double] = {
          val xs = vs.flatten
          if (xs.isEmpty) None else Some(xs.sum / xs.size)
        }

        /** detect_signal_change over slice [lo, hi): returns the metric
          * string at slice position `signalWindow` ("" when the trigger
          * sat elsewhere in the slice) wrapped in Some when ANY position
          * triggered. */
        def signalChange(lo: Int, hi: Int): Option[String] = {
          val len = hi - lo
          var winner: Option[String] = None
          var s = 0
          while (s < 3 && winner.isEmpty) {
            if (sigEnabled(s)) {
              var j = signalWindow
              var found = false
              while (j < len && !found) {
                val g = lo + j
                val prevW = (g - signalWindow until g).map(sig(s)(_))
                val currW = (g until math.min(g + signalWindow, lo + len)).map(sig(s)(_))
                val densPrev = prevW.count(_.isDefined).toDouble / prevW.size
                val densCurr = currW.count(_.isDefined).toDouble / currW.size
                if (densPrev >= 0.7 && densCurr >= 0.7) {
                  (meanOpt(prevW), meanOpt(currW)) match {
                    case (Some(pm), Some(cm)) if math.abs(cm - pm) >= thresholds(s) =>
                      found = true
                      val d = math.abs(cm - pm)
                      val fmt = String.format(java.util.Locale.ROOT,
                        s"%.${sigDigits(s)}f", Double.box(d))
                      // metric is reported only when the trigger position
                      // is the slice's own row (reasons[signal_window])
                      winner = Some(
                        if (j == signalWindow) s"${sigNames(s)}(Δ=$fmt${sigUnits(s)})"
                        else "")
                    case _ => ()
                  }
                }
                j += 1
              }
            }
            s += 1
          }
          winner
        }

        val out = Array.newBuilder[(String, java.sql.Date, Long, String, String)]
        var currentSegment = 1L
        var lastSegDate: java.time.LocalDate = null
        var i = 0
        while (i < n) {
          var triggered = false
          var reason: String = null
          var metric: String = null
          if (lastSegDate != null &&
              java.time.temporal.ChronoUnit.DAYS.between(lastSegDate, dates(i))
                >= temporalPeriod) {
            currentSegment += 1; triggered = true; lastSegDate = dates(i)
            reason = "temporal_fallback"; metric = s"≥${temporalPeriod}d"
          }
          if (!triggered && i >= gapMin && hasMissing &&
              !missing(i) && (1 to gapMin).forall(g => missing(i - g))) {
            currentSegment += 1; triggered = true; lastSegDate = dates(i)
            reason = "gap_recovery"; metric = s"gap≥${gapMin}d"
          }
          if (!triggered && i >= signalWindow) {
            signalChange(math.max(0, i - signalWindow),
                math.min(i + signalWindow, n)) match {
              case Some(m) =>
                currentSegment += 1; triggered = true; lastSegDate = dates(i)
                reason = "signal_change"; metric = if (m.isEmpty) null else m
              case None => ()
            }
          }
          if (!triggered && i > 0 && hasSource) {
            // pandas df.loc label slicing is INCLUSIVE on both ends
            val prevMode = mode(math.max(0, i - sourceWindow), i)
            val currMode = mode(i, math.min(n - 1, i + sourceWindow))
            (prevMode, currMode) match {
              case (Some(p), Some(c)) if p != c && p != "none" =>
                currentSegment += 1; lastSegDate = dates(i)
                reason = "source_change"; metric = s"$p→$c"
              case _ => ()
            }
          }
          out += ((key, rows(i)._2, currentSegment, reason, metric))
          i += 1
        }
        out.result().iterator
      }
      .toDF(keyCol, dateCol, "segment_id", "reason", "metric")
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
