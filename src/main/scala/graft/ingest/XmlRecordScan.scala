package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5 — distributed XML record scan (SURVEY §2.1).
  *
  * The reference streams a 1.5 GB Apple Health `export.xml` through a
  * byte-regex, matching `<Record type="…" value="…" startDate="…"/>`
  * elements one per physical line (HR: `src/etl/stage_csv_aggregation
  * .py:283-366`; cardio variant: `src/domains/cardiovascular/
  * cardio_from_extracted.py:80-266`).
  *
  * Spark-native: `spark.read.text` splits the file across executors (the
  * one-record-per-line layout makes line splits safe), a `contains` filter
  * drops non-matching lines BEFORE any regex work (the reference's
  * "compile the type into the scan" trick — Catalyst orders the cheap
  * filter first for free), and `regexp_extract` pulls the attributes.
  * Unlike the reference, this parallelizes across the file's byte ranges —
  * the single-file RAM wall (SURVEY §4) disappears.
  */
object XmlRecordScan {

  /** Extract an XML attribute value from a record line. */
  def attr(line: Column, name: String): Column =
    regexp_extract(line, s"""$name="([^"]*)"""", 1)

  /** Scan `path` for `<Record>` lines of the given `types`. Returns
    * (record_type, value, start_ts, end_ts, source_name) with the Apple
    * timestamp format `yyyy-MM-dd HH:mm:ss Z` parsed tz-aware.
    * `value` stays a string — sleep records carry categorical values
    * (`HKCategoryValueSleepAnalysisAsleep`); numeric callers `try_cast`. */
  def records(spark: SparkSession, path: String, types: Seq[String]): DataFrame = {
    val lines = spark.read.text(path)
    val typePred = types.map(t => col("value").contains(s"""type="$t"""")).reduce(_ || _)
    lines
      .filter(col("value").contains("<Record ") && typePred)
      // tolerate multiple <Record/> elements on one physical line (SURVEY
      // §7.5.7 risk): lookahead-split the line, one row per element. For
      // the canonical one-record-per-line layout this is a single-element
      // array — no row-count change, negligible cost.
      .select(explode(split(col("value"), "(?=<Record )")).as("value"))
      .filter(col("value").contains("<Record ") && typePred)
      .select(
        attr(col("value"), "type").as("record_type"),
        attr(col("value"), "value").as("value"),
        to_timestamp(attr(col("value"), "startDate"), "yyyy-MM-dd HH:mm:ss Z")
          .as("start_ts"),
        to_timestamp(attr(col("value"), "endDate"), "yyyy-MM-dd HH:mm:ss Z")
          .as("end_ts"),
        // the reference's `_get_date_from_dt` keeps the record's LOCAL
        // wall-clock date (offset preserved, not converted to UTC) — the
        // first 10 chars of the raw attribute ARE that date.
        to_date(substring(attr(col("value"), "startDate"), 1, 10)).as("wall_date"),
        attr(col("value"), "sourceName").as("source_name"))
  }

  /** S6-lite — `<ActivitySummary dateComponents=… activeEnergyBurned=…/>`
    * attribute rows (`src/domains/activity/activity_from_extracted
    * .py:139-173`). */
  def activitySummaries(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(col("value").contains("<ActivitySummary "))
      .select(
        to_date(attr(col("value"), "dateComponents")).as("date"),
        attr(col("value"), "activeEnergyBurned").cast("double").as("active_energy"),
        attr(col("value"), "appleExerciseTime").cast("double").as("exercise_min"),
        attr(col("value"), "appleStandHours").cast("double").as("stand_hours"))
}
