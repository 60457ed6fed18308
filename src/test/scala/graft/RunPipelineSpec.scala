package graft

import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.pipeline.RunPipeline

/** End-to-end snapshot orchestration: raw ZIP in → artifact tree out.
  * The fixture is a reference-shaped snapshot (HealthAutoExport ZIP with
  * export.xml + Medications.csv + StateOfMind.csv; no Zepp ZIP, so the
  * apple-only non-fatal path is the one exercised), spanning eight
  * months so the reference's monthly calendar folds produce real
  * train/val splits. Stage functions themselves are parity-pinned by
  * tools/reference_parity.py; this spec pins the COMPOSITION — stage
  * order, file layout, skip semantics, and the report tree. */
class RunPipelineSpec extends SparkTestBase {

  private def buildFixture(): (String, String) = {
    val root = Files.createTempDirectory("graft-runpipe").toString
    val rawDir = Paths.get(root, "raw", "P000001", "apple", "export")
    Files.createDirectories(rawDir)

    val days = (0 until 244).map(java.time.LocalDate.of(2024, 1, 1).plusDays(_))
    val xml = new StringBuilder
    xml ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<HealthData locale=\"en_US\">\n"
    days.zipWithIndex.foreach { case (d, i) =>
      val hr = 60 + i % 40
      val hrv = 30 + (i * 7) % 50
      val steps = 4000 + (i * 131) % 6000
      val asleepMin = 330 + (i * 17) % 120
      xml ++= s"""  <Record type="HKQuantityTypeIdentifierHeartRate" value="$hr" startDate="$d 08:00:00 +0000"/>\n"""
      xml ++= s"""  <Record type="HKQuantityTypeIdentifierHeartRate" value="${hr + 12}" startDate="$d 18:00:00 +0000"/>\n"""
      xml ++= s"""  <Record type="HKQuantityTypeIdentifierHeartRateVariabilitySDNN" value="$hrv" startDate="$d 07:30:00 +0000"/>\n"""
      xml ++= s"""  <Record type="HKCategoryTypeIdentifierSleepAnalysis" value="HKCategoryValueSleepAnalysisInBed" startDate="$d 22:00:00 +0000" endDate="${d.plusDays(1)} 06:00:00 +0000"/>\n"""
      xml ++= s"""  <Record type="HKCategoryTypeIdentifierSleepAnalysis" value="HKCategoryValueSleepAnalysisAsleep" startDate="$d 23:00:00 +0000" endDate="$d 23:00:00 +0000"/>\n"""
      xml ++= s"""  <Record type="HKCategoryTypeIdentifierSleepAnalysis" value="HKCategoryValueSleepAnalysisAsleep" startDate="${d.plusDays(1)} 00:00:00 +0000" endDate="${d.plusDays(1)} 0${asleepMin / 60}:${f"${asleepMin % 60}%02d"}:00 +0000"/>\n"""
      xml ++= s"""  <Record type="HKQuantityTypeIdentifierStepCount" value="$steps" startDate="$d 12:00:00 +0000"/>\n"""
      xml ++= s"""  <Record type="HKQuantityTypeIdentifierDistanceWalkingRunning" value="${steps / 1300.0}" startDate="$d 12:00:00 +0000"/>\n"""
      xml ++= s"""  <Record type="HKQuantityTypeIdentifierActiveEnergyBurned" value="${200 + i % 300}" startDate="$d 13:00:00 +0000"/>\n"""
    }
    xml ++= "</HealthData>\n"

    val meds = new StringBuilder
    meds ++= "Date,Medication,Nickname,Dosage,Unit,Status,Archived,Codings\n"
    days.zipWithIndex.foreach { case (d, i) =>
      if (i % 2 == 0)
        meds ++= s"$d 09:00:00 +0000,Sertraline,,50,mg,Taken,No,\n"
    }

    val som = new StringBuilder
    som ++= "Start,End,Kind,Labels,Associations,Valence,Valence Classification\n"
    days.zipWithIndex.foreach { case (d, i) =>
      val valence = if (i % 3 == 0) -0.8 else 0.5 // mixes the 3-class label
      som ++= s"$d 10:00:00 +0000,,Daily Mood,Calm,Work,$valence,\n"
    }

    val zipPath = rawDir.resolve("HealthAutoExport-2024-08-31.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zipPath))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.toString.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("apple_health_export/export.xml", xml.toString)
    put("apple_health_export/Medications.csv", meds.toString)
    put("apple_health_export/StateOfMind.csv", som.toString)
    zos.close()

    (s"$root/raw", s"$root/out")
  }

  test("RunPipeline: snapshot ZIP in -> full artifact tree out, stages 0-9") {
    val (rawRoot, outDir) = buildFixture()
    val logs = RunPipeline.run(spark, rawRoot, "P000001", "2024-08-31", outDir)
    val byStage = logs.map(l => (l.stage, l.name) -> l.status).toMap
    assert(byStage((0, "ingest")) === "success", logs.mkString("\n"))
    assert(byStage((1, "aggregate")) === "success", logs.mkString("\n"))
    assert(byStage((2, "unify")) === "success")
    assert(byStage((3, "label")) === "success")
    assert(byStage((4, "segment")) === "success")
    assert(byStage((5, "ml-prep")) === "success", logs.mkString("\n"))
    assert(byStage((6, "ml6")) === "success", logs.mkString("\n"))
    assert(byStage((7, "ml7-lstm")) === "skipped")
    assert(byStage((8, "tflite")) === "skipped")
    assert(byStage((9, "report")) === "success")

    // the artifact tree the reference's stages 1-9 leave behind
    def exists(p: String) = Files.exists(Paths.get(p))
    for (f <- Seq(
        s"$outDir/joined/apple/daily_cardio.csv",
        s"$outDir/joined/apple/daily_sleep.csv",
        s"$outDir/joined/apple/daily_activity.csv",
        s"$outDir/joined/apple/daily_meds_autoexport.csv",
        s"$outDir/joined/apple/daily_som_autoexport.csv",
        s"$outDir/joined/daily_unified.csv",
        s"$outDir/joined/daily_labeled.csv",
        s"$outDir/joined/segment_autolog.csv",
        s"$outDir/cv_summary.json",
        s"$outDir/confusion_matrices/cm_logreg_balanced_som_binary.json",
        s"$outDir/metrics/per_class_logreg_balanced_som_binary.csv",
        s"$outDir/metrics/ml6_extended_summary.csv",
        s"$outDir/RUN_REPORT.md"))
      assert(exists(f), s"missing artifact: $f\n${logs.mkString("\n")}")

    // cv_summary carries the reference's summary fields
    val cv = new String(Files.readAllBytes(Paths.get(s"$outDir/cv_summary.json")), "UTF-8")
    assert(cv.contains("\"model\": \"logreg_balanced\""))
    assert(cv.contains("\"target\": \"som_binary\""))
    assert(cv.contains("\"folds\""))

    // the extended frame has per-fold rows for all four families
    val ext = scala.io.Source.fromFile(s"$outDir/metrics/ml6_extended_summary.csv")
      .getLines().toSeq
    val models = ext.drop(1).map(_.split(",")(0)).distinct.sorted
    assert(models === Seq("gbt", "logreg_balanced", "rf", "svc"),
      s"extended families: $models")

    // published n_train must be the BOUNDED monthly train window the
    // folds actually train on (4 calendar months = at most 123 days),
    // not the all-non-val identity (~213 days on this 244-day fixture)
    val header = ext.head.split(",").zipWithIndex.toMap
    val nTrains = ext.drop(1).map(_.split(",")(header("n_train")).toLong)
    assert(nTrains.forall(n => n > 0 && n <= 123),
      s"n_train not bounded-window sized: $nTrains")

    // unified carries all five domains
    val unifiedHeader = scala.io.Source
      .fromFile(s"$outDir/joined/daily_unified.csv").getLines().next()
    for (c <- Seq("sleep_hours", "hr_mean", "total_steps", "med_any",
        "som_category_3class"))
      assert(unifiedHeader.contains(c), s"unified missing $c")

    val report = new String(Files.readAllBytes(Paths.get(s"$outDir/RUN_REPORT.md")), "UTF-8")
    assert(report.contains("P000001") && report.contains("2024-08-31"))
  }

  test("RunPipeline: SoM-less snapshot degrades to stages 0-4 + report") {
    val (rawRoot, outDir) = buildFixture()
    // strip StateOfMind from the fixture by rebuilding the zip without it
    val zip = Paths.get(rawRoot, "P000001", "apple", "export",
      "HealthAutoExport-2024-08-31.zip")
    val noSom = Files.createTempDirectory("graft-nosom")
    val zin = new java.util.zip.ZipInputStream(Files.newInputStream(zip))
    val zout = new ZipOutputStream(Files.newOutputStream(
      noSom.resolve("tmp.zip")))
    Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .filterNot(_.getName.contains("StateOfMind")).foreach { e =>
        zout.putNextEntry(new ZipEntry(e.getName))
        val buf = new Array[Byte](65536)
        Iterator.continually(zin.read(buf)).takeWhile(_ > 0)
          .foreach(n => zout.write(buf, 0, n))
        zout.closeEntry()
      }
    zin.close(); zout.close()
    Files.move(noSom.resolve("tmp.zip"), zip,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    val out2 = s"$outDir-nosom"
    val logs = RunPipeline.run(spark, rawRoot, "P000001", "2024-08-31", out2)
    val byStage = logs.map(l => (l.stage, l.name) -> l.status).toMap
    assert(byStage((4, "segment")) === "success")
    assert(byStage((5, "ml-prep")) === "skipped")
    assert(byStage((9, "report")) === "success")
    assert(Files.exists(Paths.get(s"$out2/RUN_REPORT.md")))
    assert(!Files.exists(Paths.get(s"$out2/cv_summary.json")))
  }
}
