package graft

import graft.qc.DomainAudits

/** Q1 — per-domain audit suite (etl_audit.py:407-1410). The cardio/sleep/
  * meds/som rule arithmetic is oracle-checked by q1_domain_audits; these
  * tests cover the remaining domains (activity, unified, labels), the
  * 10%-fabrication threshold crossing, and the CRITICAL exit semantics.
  */
class DomainAuditsSpec extends SparkTestBase {
  import spark.implicits._

  private def byCheck(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("check") ->
      ((r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed"),
        r.getAs[String]("severity")))).toMap

  test("cardio: fabrication over 10% fails, at/below passes; missing columns fail schema") {
    // 3 of 20 days fabricated (15% > 10%) -> fail
    val bad = (1 to 20).map(i =>
      (s"2021-05-$i", 60.0, if (i <= 3) 60.0 else 40.0, 90.0, 5.0, 100L))
      .toDF("date", "hr_mean", "hr_min", "hr_max", "hr_std", "hr_samples")
    val r1 = byCheck(DomainAudits.cardio(bad))
    assert(r1("fabricated_min") == ((3L, false, "CRITICAL")))
    assert(r1("zero_std") == ((0L, true, "CRITICAL")))
    assert(r1("schema_columns")._2)

    // exactly 10% (2 of 20) passes the <= threshold
    val edge = (1 to 20).map(i =>
      (s"2021-05-$i", 60.0, if (i <= 2) 60.0 else 40.0, 90.0, 5.0, 100L))
      .toDF("date", "hr_mean", "hr_min", "hr_max", "hr_std", "hr_samples")
    assert(byCheck(DomainAudits.cardio(edge))("fabricated_min")._2)

    val noStd = bad.drop("hr_std")
    val r3 = byCheck(DomainAudits.cardio(noStd.withColumn("hr_std",
      org.apache.spark.sql.functions.lit(null).cast("double"))))
    assert(r3("schema_columns")._2) // column exists (all null) -> schema ok
  }

  test("activity: all-NaN steps column is CRITICAL; populated passes") {
    val df = Seq(("2021-05-01", None: Option[Double], Some(100.0)),
      ("2021-05-02", None: Option[Double], Some(120.0)))
      .toDF("date", "total_steps", "total_active_energy")
    val r = byCheck(DomainAudits.activity(df, Seq("total_steps", "total_active_energy")))
    assert(r("all_nan_total_steps") == ((1L, false, "CRITICAL")))
    assert(r("all_nan_total_active_energy")._2)
  }

  test("unified: duplicate dates are CRITICAL; all-NaN key columns WARNING") {
    val df = Seq(("2021-05-01", Some(1), Some(0.4)), ("2021-05-01", Some(1), Some(0.2)),
      ("2021-05-02", None: Option[Int], None: Option[Double]))
      .toDF("date", "med_any", "som_mean_score")
    val r = byCheck(DomainAudits.unified(df))
    assert(r("duplicate_dates") == ((1L, false, "CRITICAL")))
    assert(r("all_nan_med_any")._2) // has non-null values
  }

  test("labels: invalid class values fail; degenerate distribution warns; exit semantics") {
    val good = Seq(("2021-05-01", 0.1, 1, 1L), ("2021-05-02", -0.2, -1, 1L))
      .toDF("date", "pbsi_score", "label_3cls", "segment_id")
    val rGood = DomainAudits.labels(good)
    assert(byCheck(rGood)("label_invalid")._2)
    assert(DomainAudits.passFail(rGood))

    val degenerate = Seq(("2021-05-01", 0.1, 7, 1L), ("2021-05-02", 0.2, 7, 1L))
      .toDF("date", "pbsi_score", "label_3cls", "segment_id")
    val rBad = DomainAudits.labels(degenerate)
    val m = byCheck(rBad)
    assert(m("label_invalid") == ((2L, false, "CRITICAL")))
    assert(m("degenerate") == ((1L, false, "WARNING")))
    assert(!DomainAudits.passFail(rBad)) // CRITICAL failed -> suite fails
  }

  test("meds escalation: violation pct over 1% is CRITICAL, under is WARNING") {
    def frame(nBad: Int) = (1 to 200).map { i =>
      (s"d$i", if (i <= nBad) 5 else 1, 2L, "A, B", "apple_autoexport")
    }.toDF("date", "med_any", "med_event_count", "med_names", "med_vendor")
    val crit = byCheck(DomainAudits.meds(frame(5)))("med_any_invalid")
    assert(crit == ((5L, false, "CRITICAL"))) // 2.5% > 1%
    val warn = byCheck(DomainAudits.meds(frame(1)))("med_any_invalid")
    assert(warn == ((1L, false, "WARNING"))) // 0.5% <= 1%
  }
}
