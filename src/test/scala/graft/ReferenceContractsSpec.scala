package graft

import org.apache.spark.sql.functions._
import graft.pipeline.ReferencePipeline

/** Pins the reference-contract semantics that tools/reference_parity.py
  * proved row-identical against the actual reference implementation —
  * as plain ScalaTest so `sbt test` alone guards them.
  */
class ReferenceContractsSpec extends SparkTestBase {
  import spark.implicits._

  test("medsDaily: UTC dates, snapshot cutoff, Taken-only, dose coercion") {
    val meds = Seq(
      // 23:30 +0100 = 22:30 UTC -> stays May 1 (meds convert to UTC)
      ("2021-05-01 23:30:00 +0100", "Sertraline", "50", "Taken"),
      // 00:30 +0100 = May 1 23:30 UTC -> date moves BACK a day in UTC
      ("2021-05-02 00:30:00 +0100", "Melatonin", "", "Taken"),
      ("2021-05-01 10:00:00 +0000", "Omega-3", "2", "Skipped"), // dropped
      ("2021-06-15 10:00:00 +0000", "Future", "1", "Taken")) // past snapshot
      .toDF("Date", "Medication", "Dosage", "Status")
    val out = ReferencePipeline.medsDaily(meds, "2021-05-31").collect()
    assert(out.length === 1)
    val d = out.head
    assert(d.getAs[String]("date") === "2021-05-01")
    assert(d.getAs[Long]("med_event_count") === 2L)
    assert(d.getAs[Double]("med_dose_total") === 50.0) // blank dosage -> 0
    assert(d.getAs[String]("med_names") === "Melatonin, Sertraline")
    assert(d.getAs[String]("med_sources") === "AutoExport")
  }

  test("somDaily: LOCAL wall-clock dates (offset stripped), kind tie-break") {
    val som = Seq(
      // 00:30 +0100: LOCAL date May 2 (SoM does NOT convert to UTC)
      ("2021-05-02 00:30:00 +0100", "Daily Mood", "Happy | Calm", "W", "0.5"),
      ("2021-05-02 10:00:00 +0000", "Momentary Emotion", "Calm", "W", "-0.75"),
      // count tie Daily Mood vs Momentary Emotion -> earliest first
      // occurrence wins (00:30 Daily Mood)
      ("2021-05-02 11:00:00 +0000", "Momentary Emotion", "", "W", ""))
      .toDF("Start", "Kind", "Labels", "Associations", "Valence")
    val out = ReferencePipeline.somDaily(som, None).collect()
    assert(out.length === 1)
    val d = out.head
    assert(d.getAs[String]("date") === "2021-05-02")
    assert(d.getAs[Long]("som_n_entries") === 3L)
    assert(d.getAs[Double]("som_last_score") === -0.75) // last NON-NULL valence
    assert(d.getAs[String]("som_kind_dominant") === "Momentary Emotion") // 2 > 1
    assert(d.getAs[String]("som_labels") === "Calm, Happy")
  }

  test("appleSleepDailyExact: quality division edges (inbed=0 -> 100; asleep=0 -> 0)") {
    def rec(v: String, d: String, h0: String, h1: String) =
      s""" <Record type="HKCategoryTypeIdentifierSleepAnalysis" sourceName="W" value="$v" startDate="$d $h0 +0000" endDate="$d $h1 +0000"/>"""
    val dir = java.nio.file.Files.createTempDirectory("graft-sleepx").toFile
    val f = new java.io.File(dir, "export.xml")
    val w = new java.io.PrintWriter(f)
    Seq("<HealthData>",
      rec("HKCategoryValueSleepAnalysisAsleepCore", "2021-05-01", "01:00:00", "05:00:00"),
      rec("HKCategoryValueSleepAnalysisInBed", "2021-05-01", "00:30:00", "08:30:00"),
      rec("HKCategoryValueSleepAnalysisAsleepDeep", "2021-05-02", "01:00:00", "03:00:00"),
      // May 2: NO inbed -> quality 100 (reference inf-clip)
      rec("HKCategoryValueSleepAnalysisInBed", "2021-05-03", "00:00:00", "06:00:00"),
      // May 3: no asleep -> quality 0
      "</HealthData>").foreach(w.println)
    w.close()
    val out = ReferencePipeline.appleSleepDailyExact(spark, f.getAbsolutePath)
      .orderBy("date").collect()
    assert(out.length === 3)
    assert(math.abs(out(0).getAs[Double]("sleep_quality_score") - 240.0 / 480 * 100) < 1e-9)
    assert(out(1).getAs[Double]("sleep_quality_score") === 100.0)
    assert(out(2).getAs[Double]("sleep_quality_score") === 0.0)
  }

  test("unifyCanonical: apple-owned missing flags survive zepp fill") {
    val apple = Seq(("2021-05-01",
      null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double],
      java.lang.Double.valueOf(65.0), null.asInstanceOf[java.lang.Double],
      null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double],
      null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double],
      null.asInstanceOf[java.lang.Double]))
      .toDF("date", "sleep_total_h", "sleep_efficiency", "hr_mean", "hr_max",
        "hrv_rmssd", "steps", "exercise_min", "stand_hours", "move_kcal")
    val zepp = Seq(("2021-05-01",
      java.lang.Double.valueOf(7.0), java.lang.Double.valueOf(85.0), // 0-100 scale
      java.lang.Double.valueOf(70.0), null.asInstanceOf[java.lang.Double],
      null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(8000.0),
      null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double],
      null.asInstanceOf[java.lang.Double]))
      .toDF("date", "sleep_total_h", "sleep_efficiency", "hr_mean", "hr_max",
        "hrv_rmssd", "steps", "exercise_min", "stand_hours", "move_kcal")
    val out = ReferencePipeline.unifyCanonical(apple, zepp).head()
    // values fill from zepp (apple null), efficiency normalized 85 -> 0.85
    assert(out.getAs[Double]("sleep_total_h") === 7.0)
    assert(out.getAs[Double]("sleep_efficiency") === 0.85)
    assert(out.getAs[Double]("apple_hr_mean") === 65.0) // apple wins
    // provenance: sleep came from zepp; cardio from apple
    assert(out.getAs[String]("source_sleep") === "zepp")
    assert(out.getAs[String]("source_cardio") === "apple")
    // the reference QUIRK: apple row exists with no sleep -> missing_sleep
    // stays 1 even though zepp filled the value
    assert(out.getAs[Int]("missing_sleep") === 1)
    assert(out.getAs[Int]("missing_cardio") === 0)
  }
}
