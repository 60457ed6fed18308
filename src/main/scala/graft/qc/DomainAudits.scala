package graft.qc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q1 — the reference's per-domain audit suite re-expressed over the
  * engine's own contract frames (`src/etl/etl_audit.py:407-1410`, run via
  * `make qc-*`). File-existence checks become column-presence checks (the
  * engine passes frames, not paths); every data-quality rule keeps the
  * reference's thresholds and CRITICAL/WARNING escalation (violation pct
  * > 1% escalates WARNING -> CRITICAL where the reference does).
  *
  * Every domain audit is ONE distributed aggregation over its input — all
  * rule counters are `sum(when(...))` columns in a single pass (the shape
  * that survives a 100-TB input) — exploded into a uniform result frame:
  * (domain, check, severity, n_violations, n_checked, passed).
  */
object DomainAudits {

  /** One rule: violation counter + denominator + severity policy.
    * `escalate1pct` = reference's "pct > 1 ? CRITICAL : WARNING";
    * `rateThreshold` = pass while violations <= threshold * checked
    * (fabrication-style rules); otherwise pass = zero violations. */
  private case class Rule(name: String, violation: Column, checked: Column,
                          severity: String = "CRITICAL",
                          escalate1pct: Boolean = false,
                          rateThreshold: Option[Double] = None)

  private def runRules(df: DataFrame, domain: String, rules: Seq[Rule],
                       extraRows: Seq[(String, String, Long, Long, Boolean)] = Nil): DataFrame = {
    val aggs = rules.flatMap { r =>
      Seq(sum(when(r.violation, 1L).otherwise(0L)).as(s"v_${r.name}"),
        r.checked.as(s"c_${r.name}"))
    }
    val agg = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.map { r =>
      val v = coalesce(col(s"v_${r.name}"), lit(0L))
      val c = coalesce(col(s"c_${r.name}"), lit(0L))
      val sev =
        if (r.escalate1pct)
          when(v * 100 > c, "CRITICAL").otherwise("WARNING")
        else lit(r.severity)
      val passed = r.rateThreshold match {
        case Some(t) => v <= c * t
        case None => v === 0L
      }
      struct(lit(domain).as("domain"), lit(r.name).as("check"),
        sev.as("severity"), v.as("n_violations"), c.as("n_checked"),
        passed.as("passed"))
    }
    val ruleFrame = agg.select(explode(array(rows: _*)).as("r")).select("r.*")
    val spark = df.sparkSession
    if (extraRows.isEmpty) ruleFrame
    else {
      import spark.implicits._
      ruleFrame.unionByName(extraRows
        .toDF("check", "severity", "n_violations", "n_checked", "passed")
        .withColumn("domain", lit(domain))
        .select("domain", "check", "severity", "n_violations", "n_checked", "passed"))
    }
  }

  /** Column-presence check (the engine's analogue of the reference's
    * schema/file checks): one row, violations = #missing columns. */
  private def schemaRow(df: DataFrame, required: Seq[String])
      : (String, String, Long, Long, Boolean) = {
    val missing = required.count(c => !df.columns.contains(c))
    ("schema_columns", "CRITICAL", missing.toLong, required.size.toLong, missing == 0)
  }

  /** Cardio audit (`etl_audit.py:407-543`): 5-metric schema + fabrication
    * rates — hr_min == hr_mean and hr_std == 0 must each stay <= 10% of
    * days with HR data. */
  def cardio(daily: DataFrame): DataFrame = {
    val base = col("hr_mean").isNotNull
    runRules(daily, "cardio", Seq(
      Rule("fabricated_min", base && col("hr_min") === col("hr_mean"),
        sum(when(base, 1L).otherwise(0L)), rateThreshold = Some(0.10)),
      Rule("zero_std", base && col("hr_std") === 0.0,
        sum(when(base, 1L).otherwise(0L)), rateThreshold = Some(0.10))),
      extraRows = Seq(schemaRow(daily,
        Seq("hr_mean", "hr_min", "hr_max", "hr_std", "hr_samples"))))
  }

  /** Sleep audit (`etl_audit.py:636-765`): hours in [0, 24] (CRITICAL),
    * efficiency in [0, 1] (WARNING). */
  def sleep(daily: DataFrame, efficiencyCol: Option[String] = None): DataFrame = {
    val hrs = col("sleep_hours")
    val rules = Seq(
      Rule("sleep_hours_range", hrs.isNotNull && (hrs < 0 || hrs > 24),
        sum(when(hrs.isNotNull, 1L).otherwise(0L)))) ++
      efficiencyCol.map { e =>
        Rule("efficiency_range",
          col(e).isNotNull && (col(e) < 0 || col(e) > 1),
          sum(when(col(e).isNotNull, 1L).otherwise(0L)), severity = "WARNING")
      }
    runRules(daily, "sleep", rules)
  }

  /** Activity audit (`etl_audit.py:545-634`): steps columns present and
    * not all-NaN. */
  def activity(daily: DataFrame, stepsCols: Seq[String]): DataFrame = {
    // all-NaN = zero non-null values, counted in one pass
    val aggs = stepsCols.map(c => count(col(c)).as(s"n_$c")) :+
      count(lit(1)).as("n_rows")
    val agg = daily.agg(aggs.head, aggs.tail: _*)
    val rows = stepsCols.map { c =>
      struct(lit("activity").as("domain"), lit(s"all_nan_$c").as("check"),
        lit("CRITICAL").as("severity"),
        when(col(s"n_$c") === 0, 1L).otherwise(0L).as("n_violations"),
        col("n_rows").as("n_checked"),
        (col(s"n_$c") > 0).as("passed"))
    }
    agg.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Meds audit over the unified frame (`etl_audit.py:766-1022`):
    * med_any in {0,1}, counts/doses non-negative, med_any=1 implies
    * events>0 and non-empty names, vendor whitelist. */
  def meds(unified: DataFrame): DataFrame = {
    val medsDay = col("med_any").isNotNull
    val medsDays = sum(when(medsDay, 1L).otherwise(0L))
    val any1 = col("med_any") === 1
    val any1Days = sum(when(medsDay && any1, 1L).otherwise(0L))
    val hasDose = unified.columns.contains("med_dose_total")
    val hasNames = unified.columns.contains("med_names")
    runRules(unified, "meds", Seq(
      Rule("med_any_invalid", medsDay && !col("med_any").isin(0, 1),
        medsDays, escalate1pct = true),
      Rule("event_count_negative",
        medsDay && col("med_event_count").isNotNull && col("med_event_count") < 0,
        medsDays, escalate1pct = true)) ++
      (if (hasDose) Seq(Rule("dose_negative",
        medsDay && col("med_dose_total").isNotNull && col("med_dose_total") < 0,
        medsDays, escalate1pct = true)) else Nil) ++
      Seq(Rule("any1_count_nonpositive",
        medsDay && any1 && col("med_event_count").isNotNull && col("med_event_count") <= 0,
        any1Days, escalate1pct = true)) ++
      (if (hasNames) Seq(Rule("any1_names_empty",
        medsDay && any1 && (col("med_names").isNull || trim(col("med_names")) === ""),
        any1Days, escalate1pct = true)) else Nil) ++
      Seq(Rule("vendor_invalid",
        col("med_vendor").isNotNull &&
          !col("med_vendor").isin("apple_export", "apple_autoexport", "fallback"),
        medsDays)))
  }

  /** SoM audit over the unified frame (`etl_audit.py:1023-1261`):
    * 3-class category in {-1,0,1}, entries >= 1, vendor whitelist, scores
    * within [-1, 1] (WARNING). */
  def som(unified: DataFrame): DataFrame = {
    val somDay = col("som_n_entries").isNotNull
    val somDays = sum(when(somDay, 1L).otherwise(0L))
    val cat = col("som_category_3class")
    val scoreRules = Seq("som_mean_score", "som_last_score")
      .filter(unified.columns.contains)
      .map { c =>
        Rule(s"range_$c", col(c).isNotNull && (col(c) < -1 || col(c) > 1),
          sum(when(col(c).isNotNull, 1L).otherwise(0L)), severity = "WARNING")
      }
    runRules(unified, "som", Seq(
      Rule("category_invalid", cat.isNotNull && !cat.isin(-1, 0, 1),
        sum(when(somDay && cat.isNotNull, 1L).otherwise(0L)), escalate1pct = true),
      Rule("entries_lt1", somDay && col("som_n_entries") < 1,
        somDays, escalate1pct = true),
      Rule("vendor_invalid",
        col("som_vendor").isNotNull &&
          !col("som_vendor").isin("apple_autoexport", "fallback"),
        somDays)) ++ scoreRules)
  }

  /** Unified-frame audit (`etl_audit.py:1262-1409`): duplicate dates
    * (CRITICAL) + all-NaN key columns (WARNING). Ordering is meaningless
    * for an unordered Dataset; duplicates subsume it. */
  def unified(df: DataFrame, keyCols: Seq[String] = Seq("med_any",
      "med_event_count", "som_category_3class", "som_mean_score")): DataFrame = {
    val present = keyCols.filter(df.columns.contains)
    val aggs = Seq(count(lit(1)).as("n_rows"),
      countDistinct(col("date")).as("n_dates")) ++
      present.map(c => count(col(c)).as(s"n_$c"))
    val agg = df.agg(aggs.head, aggs.tail: _*)
    val dupRow = struct(lit("unified").as("domain"),
      lit("duplicate_dates").as("check"), lit("CRITICAL").as("severity"),
      (col("n_rows") - col("n_dates")).as("n_violations"),
      col("n_rows").as("n_checked"),
      (col("n_rows") === col("n_dates")).as("passed"))
    val nanRows = present.map { c =>
      struct(lit("unified").as("domain"), lit(s"all_nan_$c").as("check"),
        lit("WARNING").as("severity"),
        when(col(s"n_$c") === 0, 1L).otherwise(0L).as("n_violations"),
        col("n_rows").as("n_checked"), (col(s"n_$c") > 0).as("passed"))
    }
    agg.select(explode(array(dupRow +: nanRows: _*)).as("r")).select("r.*")
  }

  /** Labels audit (`etl_audit.py:1410-1520`): label columns exist,
    * label_3cls in {-1,0,1}, non-degenerate distribution (WARNING). */
  def labels(labeled: DataFrame): DataFrame = {
    val lbl = col("label_3cls")
    runRules(labeled, "labels", Seq(
      Rule("label_invalid", lbl.isNotNull && !lbl.isin(-1, 0, 1),
        sum(when(lbl.isNotNull, 1L).otherwise(0L)))),
      extraRows = Seq(schemaRow(labeled,
        Seq("pbsi_score", "label_3cls", "segment_id"))))
      .unionByName {
        val agg = labeled.agg(countDistinct(lbl).as("k"), count(lit(1)).as("n"))
        agg.select(lit("labels").as("domain"), lit("degenerate").as("check"),
          lit("WARNING").as("severity"),
          when(col("k") <= 1, 1L).otherwise(0L).as("n_violations"),
          col("n").as("n_checked"), (col("k") > 1).as("passed"))
      }
  }

  /** The reference's exit semantics (`etl_audit.py:1795-1810`): the suite
    * fails iff any CRITICAL check failed. */
  def passFail(results: DataFrame): Boolean =
    results.filter(col("severity") === "CRITICAL" && !col("passed"))
      .head(1).isEmpty
}
