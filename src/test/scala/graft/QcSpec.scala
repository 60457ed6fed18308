package graft

import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.functions._
import graft.ingest.ZipExtract
import graft.qc.Validators

/** A21 cross-device validation + S3 zip extraction. */
class QcSpec extends SparkTestBase {
  import spark.implicits._

  test("A21: tolerances — absolute, relative, and violation flagging") {
    val apple = Seq(("2021-05-01", 60.0, 100L), ("2021-05-02", 80.0, 200L),
      ("2021-05-03", 70.0, 150L)).toDF("date", "hr_mean", "n")
    val zepp = Seq(("2021-05-01", 60.5, 102L), ("2021-05-02", 90.0, 203L),
      ("2021-05-04", 71.0, 149L)).toDF("date", "hr_mean", "n")
    val v = Validators.crossDevice(apple, zepp, "date",
      Seq("hr_mean", "n"), absTol = 1.0, relTolPct = 5.0)
    assert(v.count() === 2) // inner join on co-observed days
    val byDate = v.collect().map(r => r.getAs[String]("date") -> r).toMap
    assert(byDate("2021-05-01").getAs[Int]("consistent") === 1)
    assert(byDate("2021-05-02").getAs[Int]("consistent") === 0) // 10 bpm off
    val s = Validators.summary(v, Seq("hr_mean", "n")).head()
    assert(s.getAs[Double]("consistent_pct") === 50.0)
    assert(s.getAs[Double]("max_diff_hr_mean") === 10.0)
  }

  test("S3: zip extraction with zip-slip guard") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zip").toFile
    val zipFile = new java.io.File(dir, "export.zip")
    val zos = new ZipOutputStream(new java.io.FileOutputStream(zipFile))
    zos.putNextEntry(new ZipEntry("apple/export.xml"))
    zos.write("<HealthData></HealthData>".getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("zepp/HEARTRATE/hr.csv"))
    zos.write("time,heartRate\n".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val out = ZipExtract.extract(zipFile.getPath, new java.io.File(dir, "x").getPath)
    assert(out.size === 2)
    assert(out.exists(_.endsWith("apple/export.xml")))
    // zip-slip refused
    val evil = new java.io.File(dir, "evil.zip")
    val z2 = new ZipOutputStream(new java.io.FileOutputStream(evil))
    z2.putNextEntry(new ZipEntry("../escape.txt"))
    z2.write("x".getBytes)
    z2.closeEntry()
    z2.close()
    intercept[IllegalArgumentException] {
      ZipExtract.extract(evil.getPath, new java.io.File(dir, "y").getPath)
    }
  }
}
