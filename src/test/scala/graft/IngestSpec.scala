package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.{RobustCsv, XmlRecordScan}
import graft.operators.DailyAgg

/** S5 XML record scan + S7/S8 robust CSV, on reference-shaped fixtures
  * (FIXTURES.md F1/F2/F3): outliers, categorical sleep values, malformed
  * rows, trailing commas, alias columns.
  */
class IngestSpec extends SparkTestBase {

  private def writeTemp(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-fix").toFile
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f, "UTF-8")
    lines.foreach(w.println)
    w.close()
    f.getAbsolutePath
  }

  private val hrType = "HKQuantityTypeIdentifierHeartRate"
  private val xmlFixture = Seq(
    """<?xml version="1.0" encoding="UTF-8"?>""",
    """<HealthData locale="en_US">""",
    s""" <Record type="$hrType" sourceName="Watch" value="72" startDate="2021-05-01 08:00:00 +0000" endDate="2021-05-01 08:00:00 +0000"/>""",
    s""" <Record type="$hrType" sourceName="Watch" value="65.5" startDate="2021-05-01 09:00:00 +0000" endDate="2021-05-01 09:00:00 +0000"/>""",
    s""" <Record type="$hrType" sourceName="Watch" value="25" startDate="2021-05-01 10:00:00 +0000" endDate="2021-05-01 10:00:00 +0000"/>""",
    s""" <Record type="$hrType" sourceName="Watch" value="240" startDate="2021-05-02 08:00:00 +0000" endDate="2021-05-02 08:00:00 +0000"/>""",
    s""" <Record type="$hrType" sourceName="Watch" value="bogus" startDate="2021-05-02 09:00:00 +0000" endDate="2021-05-02 09:00:00 +0000"/>""",
    s""" <Record type="$hrType" sourceName="Watch" value="80" startDate="2021-05-02 10:30:00 +0100" endDate="2021-05-02 10:30:00 +0100"/>""",
    """ <Record type="HKCategoryTypeIdentifierSleepAnalysis" sourceName="Watch" value="HKCategoryValueSleepAnalysisAsleep" startDate="2021-05-01 23:30:00 +0000" endDate="2021-05-02 06:30:00 +0000"/>""",
    """ <Record type="HKQuantityTypeIdentifierStepCount" sourceName="Phone" value="523" startDate="2021-05-01 12:00:00 +0000" endDate="2021-05-01 12:10:00 +0000"/>""",
    """ <ActivitySummary dateComponents="2021-05-01" activeEnergyBurned="430.2" appleExerciseTime="31" appleStandHours="11"/>""",
    """</HealthData>""")

  test("S5: XML record scan extracts typed records, skips other types") {
    val path = writeTemp("export.xml", xmlFixture)
    val hr = XmlRecordScan.records(spark, path, Seq(hrType))
    assert(hr.count() === 6)
    assert(hr.filter(col("record_type") === hrType).count() === 6)
    // tz-aware parse: +0100 record lands at 09:30 UTC
    val utcHours = hr.select(hour(col("start_ts"))).collect().map(_.getInt(0)).sorted
    assert(utcHours.contains(9))
  }

  test("S5 + F2: outlier filter + A2 daily stats over scanned records") {
    val path = writeTemp("export.xml", xmlFixture)
    val hr = XmlRecordScan.records(spark, path, Seq(hrType))
      .withColumn("v", col("value").try_cast("double"))
      .filter(col("v").isNotNull)
    val filtered = DailyAgg.outlierFilter(hr, "v", 30, 220)
    // 25 and 240 dropped, "bogus" null-coerced out => 72, 65.5 on day 1; 80 on day 2
    val daily = DailyAgg.dailyStats(filtered, "start_ts", "v")
      .orderBy("date").collect()
    assert(daily.length === 2)
    assert(daily(0).getAs[Long]("n_samples") === 2)
    assert(math.abs(daily(0).getAs[Double]("v_mean") - 68.75) < 1e-9)
  }

  test("S5: sleep records keep categorical values; interval spans midnight") {
    val path = writeTemp("export.xml", xmlFixture)
    val sleep = XmlRecordScan.records(spark, path,
      Seq("HKCategoryTypeIdentifierSleepAnalysis"))
    val r = sleep.head()
    assert(r.getAs[String]("value") === "HKCategoryValueSleepAnalysisAsleep")
    val hours = sleep.select(
      (unix_timestamp(col("end_ts")) - unix_timestamp(col("start_ts"))) / 3600.0)
      .head().getDouble(0)
    assert(math.abs(hours - 7.0) < 1e-9)
  }

  test("S6: ActivitySummary attribute rows") {
    val path = writeTemp("export.xml", xmlFixture)
    val a = XmlRecordScan.activitySummaries(spark, path).head()
    assert(a.getAs[Double]("active_energy") === 430.2)
    assert(a.getAs[Double]("exercise_min") === 31.0)
  }

  test("S7: DROPMALFORMED skips short rows") {
    val path = writeTemp("zepp.csv", Seq(
      "time,heartRate",
      "2021-05-01 08:00:00+0000,72",
      "not,a,valid,row,with,too,many,fields",
      "2021-05-01 09:00:00+0000,81"))
    val df = RobustCsv.readSkipBad(spark, path)
    // NB: count() on a bare DROPMALFORMED scan skips field parsing and
    // overcounts — materialize columns to observe the dropped rows.
    assert(df.collect().length === 2)
  }

  test("S8: trailing-comma phantom columns dropped; aliases canonicalized") {
    val path = writeTemp("som.csv", Seq(
      "Start,Kind,Valence,",
      "2021-05-01 08:00:00 +0100,Daily Mood,0.5,",
      "2021-05-02 08:00:00 +0100,Momentary Emotion,-0.75,"))
    val df = RobustCsv.dropPhantomColumns(RobustCsv.readSkipBad(spark, path))
    assert(df.columns.toSeq === Seq("Start", "Kind", "Valence"))
    val canon = RobustCsv.canonicalize(df,
      Map("start_ts" -> Seq("start", "timestamp"), "valence" -> Seq("valence", "score"),
        "mood_kind" -> Seq("kind"), "absent_col" -> Seq("nope")))
    assert(canon.columns.contains("start_ts"))
    assert(canon.columns.contains("absent_col"))
    assert(canon.select("absent_col").head().isNullAt(0))
  }

  test("latin-1 fallback read") {
    val dir = Files.createTempDirectory("graft-enc").toFile
    val f = new java.io.File(dir, "latin.csv")
    val out = new java.io.FileOutputStream(f)
    out.write("name,v\ncafé,1\n".getBytes("ISO-8859-1"))
    out.close()
    val df = RobustCsv.readSkipBad(spark, f.getAbsolutePath, encoding = "ISO-8859-1")
    assert(df.select("name").head().getString(0) === "café")
  }
}
