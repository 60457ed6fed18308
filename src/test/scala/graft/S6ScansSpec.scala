package graft

import java.nio.file.Files
import graft.ingest.XmlRecordScan

/** S6 full — Workout/activity-record scan and screen-time extraction.
  * Row-identical parity against the actual reference loaders is checked
  * by tools/reference_parity.py (appleactivityfull, screentime); these
  * pin the engine-side routing/fallback semantics in sbt test.
  */
class S6ScansSpec extends SparkTestBase {

  private def writeXml(lines: Seq[String]): String = {
    val f = Files.createTempFile("graft-s6", ".xml")
    Files.write(f, (Seq("<HealthData>") ++ lines ++ Seq("</HealthData>"))
      .mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("activity records route by type priority; summary assignment wins; tz localizes") {
    val xml = writeXml(Seq(
      // 23:30 UTC on Jan 1 = 00:30 Jan 2 in Dublin winter? (UTC+0) — use +0500 source
      """  <Record type="HKQuantityTypeIdentifierStepCount" value="100.9" startDate="2024-01-01 22:00:00 -0500"/>""",
      """  <Record type="HKQuantityTypeIdentifierStepCount" value="50.2" startDate="2024-01-02 10:00:00 +0000"/>""",
      """  <Record type="HKQuantityTypeIdentifierActiveEnergyBurned" value="200.5" startDate="2024-01-02 11:00:00 +0000"/>""",
      """  <Workout type="DistanceCycling" value="1500.5" startDate="2024-01-02 12:00:00 +0000"/>""",
      """  <Record type="HKQuantityTypeIdentifierStepCount" value="77.7" creationDate="2024-01-03 09:00:00 +0000"/>""",
      """  <ActivitySummary dateComponents="2024-01-02" activeEnergyBurned="999.0" move="1" exercise="true" stand="0"/>"""))
    val out = XmlRecordScan.appleActivityDaily(spark, xml, "UTC")
      .collect().map(r => r.getAs[java.sql.Date]("date").toString -> r).toMap
    // -0500 record lands on Jan 2 03:00 UTC
    assert(out("2024-01-02").getAs[Double]("apple_steps") == 150.0) // int() truncation
    assert(out("2024-01-02").getAs[Double]("apple_distance_m") == 1500.5) // Workout routed
    assert(out("2024-01-02").getAs[Double]("apple_active_kcal") == 999.0) // summary wins
    assert(out("2024-01-02").getAs[Int]("apple_rings_close_move") == 1)
    assert(out("2024-01-02").getAs[Int]("apple_rings_close_stand") == 0)
    assert(out("2024-01-03").getAs[Double]("apple_steps") == 77.0) // creationDate fallback
  }

  test("multiple elements on one physical line all count; duplicate summaries last-win") {
    val xml = writeXml(Seq(
      // two records + a summary crammed onto ONE line
      """  <Record type="HKQuantityTypeIdentifierStepCount" value="10" startDate="2024-01-02 10:00:00 +0000"/><Record type="HKQuantityTypeIdentifierStepCount" value="20" startDate="2024-01-02 11:00:00 +0000"/><ActivitySummary dateComponents="2024-01-02" activeEnergyBurned="111.0"/>""",
      // duplicate summary for the same date, later in the document: its
      // PRESENT fields overwrite, absent fields keep the earlier value
      """  <ActivitySummary dateComponents="2024-01-02" activeEnergyBurned="222.0"/>"""))
    val out = XmlRecordScan.appleActivityDaily(spark, xml, "UTC").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("apple_steps") == 30.0) // both records counted
    assert(out.head.getAs[Double]("apple_active_kcal") == 222.0) // last assignment
  }

  test("screen time: ms heuristic, span fallback, tz cutover by UTC date") {
    val xml = writeXml(Seq(
      """  <Record type="HKCategoryTypeIdentifierScreenTime" value="600" startDate="2024-01-02 10:00:00 +0000" endDate="2024-01-02 10:30:00 +0000"/>""",
      // 180000000 sec > 36h -> treated as ms -> 180000 s
      """  <Record type="HKCategoryTypeIdentifierScreenTime" value="180000000" startDate="2024-01-02 12:00:00 +0000" endDate="2024-01-02 12:30:00 +0000"/>""",
      // no value -> end - start = 4200 s
      """  <Record type="HKCategoryTypeIdentifierScreenTime" startDate="2024-01-07 20:00:00 +0000" endDate="2024-01-07 21:10:00 +0000"/>""",
      // after cutover: 23:30 UTC Jan 7 -> 18:30 Jan 7 in New York
      """  <Record type="HKCategoryTypeIdentifierScreenTime" value="300" startDate="2024-01-07 23:30:00 +0000"/>""",
      """  <Record type="HKQuantityTypeIdentifierHeartRate" value="60" startDate="2024-01-02 10:00:00 +0000"/>"""))
    val out = XmlRecordScan.screenTimeDaily(spark, xml, "2024-01-05",
        "Europe/Dublin", "America/New_York")
      .collect().map(r => r.getAs[java.sql.Date]("date").toString ->
        r.getAs[Double]("screen_time_min")).toMap
    assert(out("2024-01-02") == (600.0 + 180000.0) / 60.0)
    assert(out("2024-01-07") == (4200.0 + 300.0) / 60.0)
    assert(out.size == 2) // HR record excluded; NY localization keeps Jan 7
  }
}
