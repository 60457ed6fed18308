package graft.qc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Canon.round

/** A21/Q2 — cross-device / re-aggregation consistency validation
  * (SURVEY §2.4 A21, §2.11 Q2).
  *
  * The reference compares per-day metrics across vendors (or between an
  * event-level recomputation and the official daily CSV) under explicit
  * tolerances: ±`absTol` absolute OR `relTolPct`% relative
  * (`src/biomarkers/validators.py:24-115`,
  * `src/etl/hr_daily_aggregation_consistency_check.py:253-313`).
  */
object Validators {

  /** Join two daily tables on `keyCol` and flag per-metric consistency.
    * Output: key, a_<metric>, b_<metric>, diff_<metric>, ok_<metric>,
    * and an overall `consistent` flag (1 iff every metric within
    * tolerance). Inner join — only co-observed days are validated. */
  def crossDevice(a: DataFrame, b: DataFrame, keyCol: String,
                  metrics: Seq[String], absTol: Double, relTolPct: Double): DataFrame = {
    val ap = metrics.foldLeft(a)((d, m) => d.withColumnRenamed(m, s"a_$m"))
    val bp = metrics.foldLeft(b)((d, m) => d.withColumnRenamed(m, s"b_$m"))
    val joined = ap.join(bp, Seq(keyCol))
    val withDiffs = metrics.foldLeft(joined) { (d, m) =>
      val diff = abs(col(s"a_$m") - col(s"b_$m"))
      val rel = diff / greatest(abs(col(s"a_$m")), lit(1e-12)) * 100.0
      d.withColumn(s"diff_$m", round(diff, 6))
        .withColumn(s"ok_$m",
          when(diff <= absTol || rel <= relTolPct, 1).otherwise(0))
    }
    withDiffs.withColumn("consistent",
      metrics.map(m => col(s"ok_$m") === 1).reduce(_ && _).cast("int"))
  }

  /** Consistency summary: % consistent days and worst per-metric diff. */
  def summary(validated: DataFrame, metrics: Seq[String]): DataFrame = {
    val aggs =
      Seq(round(avg(col("consistent")) * 100.0, 6).as("consistent_pct"),
        count(lit(1)).as("n_days")) ++
        metrics.map(m => round(max(col(s"diff_$m")), 6).as(s"max_diff_$m"))
    validated.agg(aggs.head, aggs.tail: _*)
  }
}
