package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-source daily fusion operators (SURVEY.md §2.3 J1-J11, §2.7 U1-U2).
  *
  * The reference unifier (`src/etl/stage_unify_daily.py:418-490`) builds a
  * date spine as the union of every domain's dates, then left-joins each
  * domain and fuses vendors (Apple > Zepp) column-wise. All joins are
  * equi-joins on the daily grain: at scale the daily tables are tiny
  * relative to event tables, so every join here is broadcast-friendly —
  * callers joining a daily table onto an event table should wrap the daily
  * side in `broadcast(...)`.
  */
object Unify {

  /** J2/U2 — date spine: distinct union of the `date` columns of every
    * input, the canonical grain for all downstream joins.
    * Reference: `src/etl/stage_unify_daily.py:440-460`. */
  def dateSpine(domains: Seq[DataFrame]): DataFrame =
    domains.map(_.select(col("date"))).reduce(_ union _).distinct()

  /** J2 — spine + chained left joins of each domain.
    * Reference: `src/etl/stage_unify_daily.py:440-460`. */
  def unifyAll(domains: Seq[DataFrame]): DataFrame =
    domains.foldLeft(dateSpine(domains))((spine, d) => spine.join(d, Seq("date"), "left"))

  /** J3 — fill-missing-dates preference merge: all rows of `preferred`,
    * plus only those rows of `fallback` whose date is absent from
    * `preferred` (a left-anti join + union).
    * Reference: `src/etl/stage_unify_daily.py:104-110`. */
  def preferByDate(preferred: DataFrame, fallback: DataFrame): DataFrame =
    preferred.unionByName(
      fallback.join(preferred.select("date"), Seq("date"), "left_anti"),
      allowMissingColumns = true)

  /** J4/J5 — union + grouped fusion: concat vendor frames (schema-aligned
    * by name, missing columns null-padded like pandas concat sort=False)
    * then one aggregate per date. `aggs` decides mean-vs-sum per column.
    * Reference: `src/etl/stage_unify_daily.py:152-163` (mean, cardio),
    * `:206-215` (sum, activity). */
  def unionFuse(frames: Seq[DataFrame], aggs: Seq[Column]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
      .groupBy("date")
      .agg(aggs.head, aggs.tail: _*)

  /** J6 — column-wise coalesce merge with provenance: full-outer join on
    * date, take the preferred vendor's value per column, and record which
    * vendor supplied each row ("a", "b", or "none") plus a missing flag.
    * Reference: `src/features/unify_daily.py:251-319`. */
  def coalesceMerge(a: DataFrame, b: DataFrame, valueCols: Seq[String],
                    sourceName: String): DataFrame = {
    val ap = valueCols.foldLeft(a)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val bp = valueCols.foldLeft(b)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val joined = ap.join(bp, Seq("date"), "full_outer")
    val fused = valueCols.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(s"a_$c"), col(s"b_$c"))))
    val anyA = valueCols.map(c => col(s"a_$c").isNotNull).reduce(_ || _)
    val anyB = valueCols.map(c => col(s"b_$c").isNotNull).reduce(_ || _)
    fused
      .withColumn(s"source_$sourceName",
        when(anyA, "a").when(anyB, "b").otherwise("none"))
      .withColumn(s"missing_$sourceName",
        when(valueCols.map(c => col(c).isNull).reduce(_ && _), 1).otherwise(0))
      .drop(valueCols.flatMap(c => Seq(s"a_$c", s"b_$c")): _*)
  }

  /** J8 — attach a segment id via a range predicate
    * (`seg.start <= d <= seg.end`). The segment table is tiny, so force a
    * broadcast: a non-equi join otherwise degenerates to a cartesian
    * BroadcastNestedLoopJoin anyway — making the small side explicit keeps
    * it one pass over the fact table at any scale.
    * Reference: `src/utils/temporal_instability.py:36-64`. */
  def rangeAttach(facts: DataFrame, dateCol: String, segments: DataFrame,
                  startCol: String, endCol: String): DataFrame =
    facts.join(
      broadcast(segments),
      col(dateCol) >= col(startCol) && col(dateCol) <= col(endCol),
      "left")
}
