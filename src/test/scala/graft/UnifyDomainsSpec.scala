package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.pipeline.ReferencePipeline._

/** The full `DailyUnifier.unify_all` contract (stage_unify_daily.py:56-490):
  * per-domain vendor fusion + a spine over ALL five domains, meds and SoM
  * included. Cross-checked row-identical against the actual reference by
  * tools/reference_parity.py (unifyall contract); these tests pin the
  * semantics that parity run exercises.
  */
class UnifyDomainsSpec extends SparkTestBase {
  import spark.implicits._

  private val appleSleep = Seq(
    ("2021-05-01", 7.0, 90.0), ("2021-05-02", 6.5, 80.0))
    .toDF("date", "sleep_hours", "sleep_quality_score")
  private val zeppSleep = Seq(
    ("2021-05-02", 5.0, 50.0), ("2021-05-03", 6.0, 70.0))
    .toDF("date", "sleep_hours", "sleep_quality_score")

  test("j14: scd2Build — half-open intervals partition time, one current row per key") {
    import spark.implicits._
    val changes = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 20.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-09 00:00:00"), 30.0),
      (2L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 7.0))
      .toDF("user_id", "ts", "status")
    val dim = graft.operators.Unify.scd2Build(changes, Seq("user_id"), "ts",
        Seq("status"))
      .orderBy("user_id", "valid_from").collect()
    // each interval closes at the next change; exactly one open row per key
    assert(dim.map(r => (r.getLong(0), r.getDouble(1),
      Option(r.getTimestamp(3)).map(_.toString), r.getInt(4))).toSeq === Seq(
      (1L, 10.0, Some("2024-01-05 00:00:00.0"), 0),
      (1L, 20.0, Some("2024-01-09 00:00:00.0"), 0),
      (1L, 30.0, None, 1),
      (2L, 7.0, None, 1)))
    // PIT via asofJoin lands in the containing interval, boundary to the
    // NEW interval (valid_from inclusive), pre-history unmatched
    val facts = Seq(
      (100L, 1L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00")), // boundary
      (101L, 1L, java.sql.Timestamp.valueOf("2024-01-06 12:00:00")),
      (102L, 1L, java.sql.Timestamp.valueOf("2023-12-30 00:00:00"))) // pre-history
      .toDF("event_id", "user_id", "ts")
    val dimDf = graft.operators.Unify.scd2Build(changes, Seq("user_id"), "ts",
      Seq("status"))
    val pit = graft.operators.Unify.asofJoin(facts, dimDf, Seq("user_id"),
        "ts", "valid_from", Seq("status"), matchedTsCol = "valid_from")
      .orderBy("event_id").collect()
    assert(pit(0).getDouble(3) === 20.0)
    assert(pit(1).getDouble(3) === 20.0)
    assert(pit(2).isNullAt(3))
  }

  test("sleep: Apple wins shared dates, Zepp fills the gap") {
    val out = unifySleepDomains(Some(appleSleep), Some(zeppSleep)).get
      .orderBy("date").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("2021-05-01", "2021-05-02", "2021-05-03"))
    assert(out(1).getDouble(1) == 6.5) // Apple's value on the shared date
    assert(out(2).getDouble(1) == 6.0) // Zepp fill
  }

  test("cardio: HR mean-merged, Apple-only HRV outer re-joined, absent cols padded") {
    val apple = Seq(("2021-05-01", 60.0, 1000.0, 42.0))
      .toDF("date", "hr_mean", "hr_samples", "hrv_sdnn_mean")
    val zepp = Seq(("2021-05-01", 70.0, 2000.0), ("2021-05-02", 64.0, 1500.0))
      .toDF("date", "hr_mean", "hr_samples")
    val out = unifyCardioDomains(Some(apple), Some(zepp)).get
    // all 5 HR + 5 HRV columns exist regardless of input coverage
    assert(Seq("hr_min", "hr_max", "hr_std", "hrv_sdnn_median", "n_hrv_sdnn")
      .forall(out.columns.contains))
    val rows = out.orderBy("date").collect()
    assert(rows(0).getAs[Double]("hr_mean") == 65.0) // (60+70)/2
    assert(rows(0).getAs[Double]("hrv_sdnn_mean") == 42.0)
    assert(rows(1).getAs[Double]("hr_mean") == 64.0) // zepp-only day
    assert(rows(1).isNullAt(rows(1).fieldIndex("hrv_sdnn_mean")))
  }

  test("activity: both-present days sum; all-null group becomes 0.0 like pandas") {
    val apple = Seq(("2021-05-01", Some(1000.0), Some(1.0), Some(100.0)),
      ("2021-05-02", None: Option[Double], None: Option[Double], None: Option[Double]))
      .toDF("date", "total_steps", "total_distance", "total_active_energy")
    val zepp = Seq(("2021-05-01", Some(500.0), Some(0.5), Some(50.0)))
      .toDF("date", "total_steps", "total_distance", "total_active_energy")
    val rows = unifyActivityDomains(Some(apple), Some(zepp)).get
      .orderBy("date").collect()
    assert(rows(0).getAs[Double]("total_steps") == 1500.0)
    assert(rows(1).getAs[Double]("total_steps") == 0.0) // pandas sum([NaN]) == 0.0
  }

  test("meds: static vendor priority apple_export > apple_autoexport; vendor recorded") {
    val autoexp = Seq(("2021-05-01", 1, 3L)).toDF("date", "med_any", "med_event_count")
    val exportv = Seq(("2021-05-01", 1, 2L)).toDF("date", "med_any", "med_event_count")
    val out = unifyMedsDomain(Seq(
      "apple_autoexport" -> autoexp, "apple_export" -> exportv)).get.collect()
    assert(out.head.getAs[String]("med_vendor") == "apple_export")
    assert(out.head.getAs[Long]("med_event_count") == 2L)
    val only = unifyMedsDomain(Seq("apple_autoexport" -> autoexp)).get.collect()
    assert(only.head.getAs[String]("med_vendor") == "apple_autoexport")
  }

  test("unify_all: spine covers every domain's dates including meds/SoM-only days") {
    val som = Seq(("2021-05-09", 0.4, 0.5, 2L, 1))
      .toDF("date", "som_mean_score", "som_last_score", "som_n_entries",
        "som_category_3class")
    val unified = unifyAllDomains(
      unifySleepDomains(Some(appleSleep), Some(zeppSleep)),
      None, None,
      unifyMedsDomain(Seq("apple_autoexport" ->
        Seq(("2021-05-07", 1, 1L)).toDF("date", "med_any", "med_event_count"))),
      unifySomDomain(Some(som)))
    val dates = unified.select("date").as[String].collect().sorted.toSeq
    assert(dates == Seq("2021-05-01", "2021-05-02", "2021-05-03", "2021-05-07", "2021-05-09"))
    val somRow = unified.filter($"date" === "2021-05-09").collect().head
    assert(somRow.getAs[String]("som_vendor") == "apple_autoexport")
    assert(somRow.isNullAt(somRow.fieldIndex("sleep_hours")))
  }
}
