package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Canon.round

/** ML-prep operators (SURVEY §2.9 M1'/M3, §2.2 F11).
  *
  * M1 (sklearn IterativeImputer with posterior sampling) is stochastic and
  * platform-dependent — a documented semantic-deviation zone (SURVEY
  * §7.5.1). The engine ships the reference's own deterministic fallback
  * (`scripts/run_full_pipeline.py:959-969`): per-segment median imputation
  * with a global-median second pass, both as distributed aggregations.
  */
object Impute {

  /** M1' — per-group median imputation with global-median fallback:
    * nulls take the group's exact median; groups that are entirely null
    * take the global median; still-null (all-null column) takes 0.0.
    * Group stats are one aggregate + a broadcast join — no per-row
    * subqueries, no driver loop over groups. */
  def medianImpute(df: DataFrame, groupCols: Seq[String],
                   features: Seq[String]): DataFrame = {
    val gAggs = features.map(f => percentile(col(f), lit(0.5)).as(s"__gm_$f"))
    val groupStats = df.groupBy(groupCols.map(col): _*).agg(gAggs.head, gAggs.tail: _*)
    val aAggs = features.map(f => percentile(col(f), lit(0.5)).as(s"__am_$f"))
    val globalStats = df.agg(aAggs.head, aAggs.tail: _*)
    val joined = df
      .join(broadcast(groupStats), groupCols, "left")
      .crossJoin(broadcast(globalStats))
    val filled = features.foldLeft(joined)((d, f) =>
      d.withColumn(f,
        coalesce(col(f), col(s"__gm_$f"), col(s"__am_$f"), lit(0.0))))
    filled.drop(features.flatMap(f => Seq(s"__gm_$f", s"__am_$f")): _*)
  }

  /** M3 — anti-leak standard scaling: fit mean/std on the TRAIN rows only
    * (`trainPred`), apply to every row. The fitted stats are two scalars
    * per feature broadcast back — the reference's per-fold
    * fit-on-train-only contract (`src/etl/ml_extended_utils.py:249-290`). */
  def scaleFitOnTrain(df: DataFrame, trainPred: Column,
                      features: Seq[String]): DataFrame = {
    val aggs = features.flatMap(f => Seq(
      avg(when(trainPred, col(f))).as(s"__m_$f"),
      stddev_samp(when(trainPred, col(f))).as(s"__s_$f")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val scaled = features.foldLeft(joined)((d, f) =>
      d.withColumn(s"${f}_scaled",
        round(when(col(s"__s_$f").isNotNull && col(s"__s_$f") > 0,
          (col(f) - col(s"__m_$f")) / col(s"__s_$f"))
          .otherwise(lit(0.0)), 6)))
    scaled.drop(features.flatMap(f => Seq(s"__m_$f", s"__s_$f")): _*)
  }

  /** F11 — anti-leak column drop with assertion: removing label-derived
    * columns before ML, failing loudly if any survive. */
  def antiLeakDrop(df: DataFrame, leakCols: Seq[String]): DataFrame = {
    val out = df.drop(leakCols: _*)
    val leaked = out.columns.toSet.intersect(leakCols.toSet)
    require(leaked.isEmpty, s"anti-leak drop failed for: $leaked")
    out
  }
}
