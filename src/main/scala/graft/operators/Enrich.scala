package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon.round

/** Rolling-window enrichment operators (SURVEY.md §2.5 W1-W3, W5-W8).
  *
  * The reference enrichers (`src/domains/enriched/pre/prejoin_enricher.py`,
  * `post/postjoin_enricher.py`) add 7-ROW rolling means, global z-scores,
  * rolling correlations, and gap interpolation to the daily table. Window
  * frames are ROW-based (pandas `rolling(7)` rolls over rows, not calendar
  * days) — replicated here with `rowsBetween` for parity (SURVEY §7.5.3).
  *
  * All windows partition by an entity key so they distribute; per-key daily
  * series are small by construction.
  */
object Enrich {

  /** W1 — k-row rolling mean (min_periods=1) per feature, `_roll` suffix.
    * Reference: `src/domains/enriched/pre/prejoin_enricher.py:71-125`. */
  def rollingMean(daily: DataFrame, keyCol: String, orderCol: String,
                  features: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(k - 1), 0)
    features.foldLeft(daily)((d, f) =>
      d.withColumn(s"${f}_roll", round(avg(col(f)).over(w), 6)))
  }

  /** W5 — rolling std/var with a min-observation guard (min_periods=n).
    * Reference: `src/biomarkers/circadian.py:136-194`. */
  def rollingStd(daily: DataFrame, keyCol: String, orderCol: String,
                 feature: String, k: Int, minPeriods: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(k - 1), 0)
    daily
      .withColumn("__n", count(col(feature)).over(w))
      .withColumn(s"${feature}_rollstd",
        when(col("__n") >= minPeriods, round(stddev_samp(col(feature)).over(w), 6)))
      .drop("__n")
  }

  /** W11 (beyond ref) — exponentially-weighted moving average, the pandas
    * `ewm(alpha=..., adjust=True, ignore_na=False)` shape Spark has no
    * window aggregate for: `y_i = Σ_d (1-α)^d x_{i-d} / Σ_d (1-α)^d`,
    * weights by absolute lag, null samples contributing neither numerator
    * nor denominator. Truncated at `window` ROWS (weights below
    * (1-α)^window are negligible for any practical α — the standard
    * finite-window approximation), so the state per row is a bounded
    * array, not the unbounded recursion: one collect over the ROWS frame
    * + a codegen'd higher-order fold, partitioned by the entity key like
    * every other window here. Adds `{feature}_ewma`. */
  def ewma(daily: DataFrame, keyCol: String, orderCol: String,
           feature: String, alpha: Double, window: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    val wRank = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val w = wRank.rowsBetween(-(window - 1), 0)
    val df = daily.withColumn("__ew_rn",
      row_number().over(wRank).cast("double"))
    val hist = collect_list(
      struct(col("__ew_rn").as("rn"), col(feature).cast("double").as("x")))
      .over(w)
    val folded = aggregate(hist,
      struct(lit(0.0).as("num"), lit(0.0).as("den")),
      (acc, e) => {
        val pw = pow(lit(1.0 - alpha), col("__ew_rn") - e.getField("rn"))
        struct(
          (acc.getField("num") +
            when(e.getField("x").isNotNull, pw * e.getField("x"))
              .otherwise(0.0)).as("num"),
          (acc.getField("den") +
            when(e.getField("x").isNotNull, pw).otherwise(0.0)).as("den"))
      })
    df.withColumn("__ew_acc", folded)
      .withColumn(s"${feature}_ewma",
        when(col("__ew_acc.den") > 0,
          round(col("__ew_acc.num") / col("__ew_acc.den"), 6)))
      .drop("__ew_rn", "__ew_acc")
  }

  /** W2 — global z-score per feature (`_zscore` suffix) computed via a
    * cross-join of one aggregated stats row (broadcast), not a global
    * window — no single-partition stage at scale.
    * Reference: `prejoin_enricher.py:59-68`. */
  def globalZScores(daily: DataFrame, features: Seq[String]): DataFrame = {
    val aggs = features.flatMap(f => Seq(
      avg(col(f)).as(s"__m_$f"), stddev_samp(col(f)).as(s"__s_$f")))
    val stats = daily.agg(aggs.head, aggs.tail: _*)
    val joined = daily.crossJoin(broadcast(stats))
    features.foldLeft(joined)((d, f) =>
      d.withColumn(s"${f}_zscore",
        when(col(s"__s_$f") > 0, round((col(f) - col(s"__m_$f")) / col(s"__s_$f"), 6)))
      ).drop(features.flatMap(f => Seq(s"__m_$f", s"__s_$f")): _*)
  }

  /** W3 — k-row rolling Pearson correlation of two features, expanded into
    * windowed sums. (Spark's `corr` as a window aggregate divides by zero
    * on 1-row frames under ANSI mode; the expansion also gives an explicit
    * zero-variance guard matching SQL `corr`'s NULL.)
    * Reference: `src/domains/enriched/post/postjoin_enricher.py:18-36`. */
  def rollingCorr(daily: DataFrame, keyCol: String, orderCol: String,
                  a: String, b: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(k - 1), 0)
    val (x, y) = (col(a), col(b))
    val n = count(when(x.isNotNull && y.isNotNull, 1)).over(w).cast("double")
    val sx = sum(x).over(w)
    val sy = sum(y).over(w)
    val sxy = sum(x * y).over(w)
    val sxx = sum(x * x).over(w)
    val syy = sum(y * y).over(w)
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val cov = n * sxy - sx * sy
    daily.withColumn(s"corr_${a}_$b",
      round(when(vx > 0 && vy > 0, cov / sqrt(vx * vy)), 6))
  }

  /** W6 — linear interpolation of interior nulls + edge fill
    * (pandas `interpolate(method="linear", limit_direction="both")`):
    * interior gaps are linearly interpolated between the previous and next
    * non-null anchors by row distance; leading/trailing nulls take the
    * nearest anchor. The classic 4-window formulation.
    * Reference: `src/domains/enriched/post/postjoin_enricher.py:54-88`. */
  def interpolateLinear(df: DataFrame, keyCol: String, orderCol: String,
                        feature: String): DataFrame = {
    val wAll = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val wPrev = wAll.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = wAll.rowsBetween(0, Window.unboundedFollowing)
    val v = col(feature)
    df.withColumn("__rn", row_number().over(wAll))
      .withColumn("__pv", last(v, ignoreNulls = true).over(wPrev))
      .withColumn("__prn", last(when(v.isNotNull, col("__rn")), ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(v, ignoreNulls = true).over(wNext))
      .withColumn("__nrn", first(when(v.isNotNull, col("__rn")), ignoreNulls = true).over(wNext))
      .withColumn(s"${feature}_interp", round(
        when(v.isNotNull, v)
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              (col("__rn") - col("__prn")) / (col("__nrn") - col("__prn")))
          .when(col("__pv").isNotNull, col("__pv"))
          .otherwise(col("__nv")), 6))
      .drop("__rn", "__pv", "__prn", "__nv", "__nrn")
  }

  /** W7 — k-row sliding sequence summary for sequence-model prep: per row,
    * the window start/end order keys, element count, and windowed mean —
    * emitted only for complete windows (size == k).
    * Reference: `src/etl/ml7_analysis.py:475-493`. */
  def slidingSequences(daily: DataFrame, keyCol: String, orderCol: String,
                       feature: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(k - 1), 0)
    daily
      .withColumn("seq_n", count(col(feature)).over(w))
      .withColumn("seq_start", first(col(orderCol)).over(w))
      .withColumn("seq_mean", round(avg(col(feature)).over(w), 6))
      .filter(col("seq_n") === k)
  }

  /** W7 (full) — materialized k-row sliding sequences for sequence models:
    * per complete window, the ordered feature array (+ label of the last
    * element), the LSTM input contract. Arrays are k doubles — bounded
    * per row — and the window partitions by key, so this scales like any
    * other window op. Reference: `src/etl/ml7_analysis.py:475-493`. */
  def sequenceArrays(daily: DataFrame, keyCol: String, orderCol: String,
                     features: Seq[String], labelCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(k - 1), 0)
    val withSeqs = features.foldLeft(daily)((d, f) =>
      d.withColumn(s"seq_$f", collect_list(col(f)).over(w)))
    withSeqs
      .withColumn("seq_len", size(col(s"seq_${features.head}")))
      .filter(col("seq_len") === k)
      .select((Seq(col(keyCol), col(orderCol).as("seq_end"), col(labelCol).as("y")) ++
        features.map(f => col(s"seq_$f"))): _*)
  }

  /** W8 — persistence baseline: previous row's label per key. */
  def persistenceBaseline(daily: DataFrame, keyCol: String, orderCol: String,
                          labelCol: String): DataFrame =
    daily.withColumn("label_persist",
      lag(col(labelCol), 1).over(Window.partitionBy(col(keyCol)).orderBy(col(orderCol))))

  /** Interpolated median of an array column (linear interpolation at even
    * counts — the `quantile_cont(0.5)` / pandas definition). Null for an
    * empty array. Pure column arithmetic, codegen-friendly. */
  private def arrayMedian(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val s = array_sort(a)
    val n = size(a)
    when(n === 0, lit(null).cast("double"))
      .when(pmod(n, lit(2)) === 1,
        element_at(s, ((n + 1) / 2).cast("int")).cast("double"))
      .otherwise((element_at(s, (n / 2).cast("int")) +
        element_at(s, (n / 2).cast("int") + 1)) / 2.0)
  }

  /** W12 (beyond ref) — rolling robust outlier detection: trailing-window
    * exact median, MAD (median absolute deviation), robust z-score
    * `(x - med) / (1.4826·mad)` and an outlier flag at `|z| > zThresh`.
    * The robust counterpart of the rolling mean/std family: one extreme
    * value shifts a windowed mean/std enough to mask ITSELF (and flag its
    * neighbors), while the median/MAD pair stays put — the standard spike
    * detector for sensor streams.
    *
    * Spark has no windowed median, so the trailing frame is collected per
    * row — a BOUNDED array (`k` rows) like w7's sequence windows, then
    * pure sorted-array arithmetic (no UDF): the same
    * partition-by-entity-key shuffle as every other window here, state
    * O(k) per row at any corpus size. Rows with fewer than `minPeriods`
    * observations get null med/mad/z and flag 0; mad = 0 (constant
    * window) also nulls z — a spike AFTER k identical values is caught by
    * the NEXT row's window, while dividing by ~0 would flag every tiny
    * float wobble.
    *
    * Adds `{feature}_med`, `{feature}_mad`, `{feature}_rz`,
    * `{feature}_outlier`. */
  def rollingMedianMad(daily: DataFrame, keyCol: String, orderCol: String,
                       feature: String, k: Int, minPeriods: Int,
                       zThresh: Double): DataFrame = {
    require(k >= 1, s"window must be >= 1, got $k")
    require(minPeriods >= 1, s"minPeriods must be >= 1, got $minPeriods")
    require(zThresh > 0, s"zThresh must be > 0, got $zThresh")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(k - 1), 0)
    val med = arrayMedian(col("__win"))
    val mad = arrayMedian(transform(col("__win"), x => abs(x - col("__med"))))
    val rz = (col(feature) - col("__med")) / (lit(1.4826) * col("__mad"))
    daily
      .withColumn("__win", collect_list(col(feature)).over(w))
      .withColumn("__med", med)
      .withColumn("__mad", mad)
      .withColumn("__ok", size(col("__win")) >= minPeriods)
      .withColumn(s"${feature}_med",
        when(col("__ok"), round(col("__med"), 6)))
      .withColumn(s"${feature}_mad",
        when(col("__ok"), round(col("__mad"), 6)))
      .withColumn(s"${feature}_rz",
        when(col("__ok") && col("__mad") > 0, round(rz, 6)))
      .withColumn(s"${feature}_outlier",
        when(col("__ok") && col("__mad") > 0 && abs(rz) > zThresh, 1)
          .otherwise(0))
      .drop("__win", "__med", "__mad", "__ok")
  }

  /** Day-of-week seasonal decomposition of a daily series — the
    * weekday-profile form of classical seasonal adjustment (the
    * reference normalizes per segment; production daily metrics also
    * need the weekly cycle removed before drift/outlier logic so a
    * quiet Sunday doesn't read as anomaly). Per entity: the weekday
    * profile mean, the seasonal component (profile − entity mean), the
    * seasonally-adjusted series and the residual. `dow` is 0=Monday.
    *
    * Shuffle story: two whole-partition windows, keyed (entity, dow)
    * and (entity) — both hash exchanges on keys prefixed by the entity
    * id, no global stage; profile cardinality is entities×7. */
  def seasonalDecompose(daily: DataFrame, keyCol: String, dateCol: String,
                        feature: String): DataFrame = {
    val wDow = Window.partitionBy(col(keyCol), col("dow"))
    val wKey = Window.partitionBy(col(keyCol))
    daily
      .withColumn("dow", weekday(col(dateCol)))
      .withColumn("__dow_mean", avg(col(feature)).over(wDow))
      .withColumn("__key_mean", avg(col(feature)).over(wKey))
      .select(col(keyCol), col(dateCol), col(feature), col("dow"),
        round(col("__dow_mean"), 6).as(s"${feature}_dow_mean"),
        round(col("__dow_mean") - col("__key_mean"), 6)
          .as(s"${feature}_seasonal"),
        round(col(feature) - (col("__dow_mean") - col("__key_mean")), 6)
          .as(s"${feature}_adjusted"),
        round(col(feature) - col("__dow_mean"), 6)
          .as(s"${feature}_residual"))
  }
}
