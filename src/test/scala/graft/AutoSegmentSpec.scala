package graft

import org.apache.spark.sql.functions._
import graft.operators.Segmentation

/** autoSegmentFull — the reference's generate_segments loop
  * (auto_segment.py:211-305). Row-identical parity against the actual
  * reference is checked by tools/reference_parity.py (autoseg, 280 days,
  * all 4 rules firing); these tests pin the individual rule semantics.
  */
class AutoSegmentSpec extends SparkTestBase {
  import spark.implicits._

  private def daily(rows: Seq[(String, Option[Double], Option[Double],
      Option[Double], String, Int, Int)]) =
    rows.toDF("date", "hr_mean", "hrv_rmssd", "sleep_efficiency",
        "source_cardio", "missing_cardio", "missing_sleep")
      .withColumn("date", col("date").cast("date"))
      .withColumn("pid", lit("P1"))

  private def dates(n: Int, from: Int = 1) =
    (from until from + n).map(d => f"2021-03-${d}%02d")

  test("gap recovery: >=3 both-missing days then an observed day opens a segment") {
    val rows = dates(10).zipWithIndex.map { case (d, i) =>
      val miss = i >= 3 && i <= 5 // 3-day double gap, recovery at i=6
      (d, Some(60.0), Some(40.0), Some(0.9), "apple",
        if (miss) 1 else 0, if (miss) 1 else 0)
    }
    val out = Segmentation.autoSegmentFull(daily(rows), "pid", "date")
      .orderBy("date").collect()
    assert(out(6).getAs[String]("reason") == "gap_recovery")
    assert(out(6).getAs[Long]("segment_id") == 2L)
    assert(out(5).getAs[Long]("segment_id") == 1L)
  }

  test("signal change: sustained HR delta >= 8 bpm triggers with HR priority") {
    // flat 60 bpm then flat 75 bpm — a clean level shift at i=10
    val rows = dates(20).zipWithIndex.map { case (d, i) =>
      (d, Some(if (i < 10) 60.0 else 75.0), Some(40.0), Some(0.9), "apple", 0, 0)
    }
    val out = Segmentation.autoSegmentFull(daily(rows), "pid", "date")
      .orderBy("date").collect()
    val triggered = out.filter(_.getAs[String]("reason") == "signal_change")
    assert(triggered.nonEmpty)
    // the metric string names HR when the trigger lands on the row itself
    assert(out.exists(r => Option(r.getAs[String]("metric"))
      .exists(_.startsWith("HR_mean_change"))))
  }

  test("source change: dominant vendor flip opens a segment; 'none' never does") {
    val rows = dates(20).zipWithIndex.map { case (d, i) =>
      (d, Some(60.0), Some(40.0), Some(0.9), if (i < 10) "apple" else "zepp", 0, 0)
    }
    val out = Segmentation.autoSegmentFull(daily(rows), "pid", "date")
      .orderBy("date").collect()
    assert(out.exists(_.getAs[String]("reason") == "source_change"))

    val noneRows = dates(20).zipWithIndex.map { case (d, i) =>
      (d, Some(60.0), Some(40.0), Some(0.9), if (i < 10) "none" else "zepp", 0, 0)
    }
    val out2 = Segmentation.autoSegmentFull(daily(noneRows), "pid", "date")
      .orderBy("date").collect()
    assert(!out2.exists(_.getAs[String]("reason") == "source_change"))
  }

  test("temporal fallback: fires 60 days after the last boundary, never before one") {
    // a source flip at i=10 sets last_seg_date; 60+ quiet days follow
    val cal = (0 until 80).map(i =>
      java.time.LocalDate.of(2021, 3, 1).plusDays(i.toLong).toString)
    val rows2 = cal.zipWithIndex.map { case (d, i) =>
      (d, Some(60.0), Some(40.0), Some(0.9), if (i < 10) "apple" else "zepp", 0, 0)
    }
    val out = Segmentation.autoSegmentFull(daily(rows2), "pid", "date")
      .orderBy("date").collect()
    assert(out.exists(_.getAs[String]("reason") == "temporal_fallback"))
    val firstBoundary = out.indexWhere(_.getAs[String]("reason") != null)
    assert(out.take(firstBoundary).forall(_.getAs[Long]("segment_id") == 1L))
  }

  test("multiSignalSegments: priority chain and 1-based running segment ids") {
    val rows = (0 until 30).map { i =>
      val d = java.time.LocalDate.of(2021, 3, 1).plusDays(i.toLong).toString
      (d, if (i < 15) Some(10.0) else Some(50.0), Some(5.0), 0)
    }.toDF("date", "sig", "other", "missing")
      .withColumn("date", col("date").cast("date"))
      .withColumn("pid", lit("P1"))
    val out = Segmentation.multiSignalSegments(rows, "pid", "date",
      Seq(("sig", 8.0, "sig_shift"), ("other", 3.0, "other_shift")),
      k = 7, minDensity = 0.7, gapMin = 3, missingCol = "missing")
      .orderBy("date").collect()
    assert(out.head.getAs[Long]("segment_id") == 1L)
    assert(out.exists(_.getAs[String]("seg_reason") == "sig_shift"))
    assert(out.last.getAs[Long]("segment_id") > 1L)
  }
}
