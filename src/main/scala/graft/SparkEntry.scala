package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{EventQueries, IngestQueries, MlQueries, RelationalQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented SURVEY §2 operator (plus the
  * training-data-pipeline extensions) to a deterministic query over the
  * driver testdata; `oracleSql` holds the DuckDB twin of each. Queries
  * without a twin (approximate/engine-only ops) get the driver's
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The PBSI end-to-end slice: per-user daily features -> per-segment
    * z-scores -> weighted clipped composite -> two-pass percentile labels
    * (SURVEY §7.3). */
  def entry(spark: SparkSession): DataFrame =
    queries("a13_pbsi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventQueries.queries ++ RelationalQueries.queries ++ TextQueries.queries ++
      MlQueries.queries ++ IngestQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * Every `round(x, s)` is rewritten to the canonical epsilon-shifted
    * rounding (see [[graft.functions.Canon]]) to match the Spark side. */
  def oracleSql: Map[String, String] =
    (EventQueries.oracles ++ RelationalQueries.oracles ++ TextQueries.oracles ++
      MlQueries.oracles ++ IngestQueries.oracles)
      .map { case (k, v) => k -> graft.functions.Canon.epsifySql(v) }
}
