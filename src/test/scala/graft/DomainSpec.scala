package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.TimeParse
import graft.operators._

/** Reference-shaped domain semantics: PBSI labeling, sessionization
  * boundary rules, pandas-style interpolation, naps JSON, timestamp
  * parsing, tz cutover, unit heuristics (SURVEY §2.4/§2.5/§2.8).
  */
class DomainSpec extends SparkTestBase {
  import spark.implicits._

  test("W4: segment boundaries — initial, gap, month boundary") {
    val daily = Seq(
      ("p1", "2021-05-29"), ("p1", "2021-05-30"), ("p1", "2021-05-31"),
      ("p1", "2021-06-01"), // month boundary
      ("p1", "2021-06-02"),
      ("p1", "2021-06-05"), // 3-day gap
      ("p1", "2021-06-06"))
      .toDF("pid", "d").withColumn("d", col("d").cast("date"))
    val seg = Segmentation.segmentDays(daily, "pid", "d")
    val reasons = seg.orderBy("d").select("seg_reason").collect().map(_.getString(0))
    assert(reasons.toSeq === Seq("initial", null, null, "time_boundary", null, "gap", null))
    val table = Segmentation.segmentTable(seg, "pid", "d").orderBy("segment_id").collect()
    assert(table.length === 3)
    assert(table.map(_.getAs[Long]("cnt")).toSeq === Seq(3L, 2L, 2L))
    assert(table.map(_.getAs[String]("reason")).toSeq ===
      Seq("initial", "time_boundary", "gap"))
  }

  test("A12-A14: PBSI composite — z-scores, clipping, quality floor") {
    // one segment with known mean/std: values 1,2,3 => mean 2, std 1
    val df = Seq((1, 1.0), (1, 2.0), (1, 3.0)).toDF("segment_id", "x")
    val z = Labels.groupZScores(df, Seq("segment_id"), Seq("x"))
      .orderBy("x").select("z_x").collect().map(_.getDouble(0))
    assert(z.toSeq === Seq(-1.0, 0.0, 1.0))
    // zero-std segment -> z = 0 (reference _get_z_safe)
    val flat = Seq((1, 5.0), (1, 5.0)).toDF("segment_id", "x")
    val zf = Labels.groupZScores(flat, Seq("segment_id"), Seq("x"))
      .select("z_x").collect().map(_.getDouble(0))
    assert(zf.forall(_ === 0.0))
    // clipping at ±3
    val clipped = spark.range(1).select(Labels.clip(lit(7.5), -3, 3)).head().getDouble(0)
    assert(clipped === 3.0)
    // quality factor: 0.8^2 = 0.64; floor at 0.5 for >=4 missing
    val q2 = spark.range(1)
      .select(Labels.qualityFactor(Seq(lit(true), lit(true), lit(false))))
      .head().getDouble(0)
    assert(math.abs(q2 - 0.64) < 1e-12)
    val q4 = spark.range(1)
      .select(Labels.qualityFactor(Seq(lit(true), lit(true), lit(true), lit(true))))
      .head().getDouble(0)
    assert(q4 === 0.5)
  }

  test("A13: two-pass percentile labels match quantile semantics") {
    val df = (1 to 100).map(i => ("p", i.toDouble)).toDF("k", "s")
    val labeled = Labels.twoPassPercentileLabel(df, "s", 0.25, 0.75)
    val dist = labeled.groupBy("label_3cls").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // P25 = 25.75, P75 = 75.25 (linear interp) -> 25 low, 25 high, 50 mid
    assert(dist(-1) === 25L)
    assert(dist(1) === 25L)
    assert(dist(0) === 50L)
  }

  test("W6: interpolation — interior linear, edges nearest (pandas both)") {
    val df = Seq(
      ("k", 1, null.asInstanceOf[java.lang.Double]),
      ("k", 2, java.lang.Double.valueOf(10.0)),
      ("k", 3, null.asInstanceOf[java.lang.Double]),
      ("k", 4, null.asInstanceOf[java.lang.Double]),
      ("k", 5, java.lang.Double.valueOf(40.0)),
      ("k", 6, null.asInstanceOf[java.lang.Double]))
      .toDF("k", "o", "v")
    val out = Enrich.interpolateLinear(df, "k", "o", "v")
      .orderBy("o").select("v_interp").collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(10.0, 10.0, 20.0, 30.0, 40.0, 40.0))
  }

  test("W6 property: interpolation matches the pandas model on random gap patterns") {
    // in-memory model of pandas interpolate(method=linear, limit_direction=both)
    def model(vs: Seq[Option[Double]]): Seq[Double] = {
      val n = vs.length
      val idx = vs.zipWithIndex.collect { case (Some(v), i) => (i, v) }
      vs.indices.map { i =>
        vs(i).getOrElse {
          val prev = idx.filter(_._1 < i).lastOption
          val next = idx.find(_._1 > i)
          (prev, next) match {
            case (Some((pi, pv)), Some((ni, nv))) => pv + (nv - pv) * (i - pi).toDouble / (ni - pi)
            case (Some((_, pv)), None) => pv
            case (None, Some((_, nv))) => nv
            case _ => Double.NaN
          }
        }
      }
    }
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { trial =>
      val n = 3 + rnd.nextInt(12)
      val vs = Seq.fill(n)(
        if (rnd.nextBoolean()) Some(math.rint(rnd.nextDouble() * 1000) / 10) else None)
      if (vs.exists(_.isDefined)) {
        val df = vs.zipWithIndex
          .map { case (v, i) => ("k", i, v.map(java.lang.Double.valueOf).orNull) }
          .toDF("k", "o", "v")
        val got = Enrich.interpolateLinear(df, "k", "o", "v")
          .orderBy("o").select("v_interp").collect().map(_.getDouble(0))
        val want = model(vs)
        got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
          assert(math.abs(g - w) < 1e-6, s"trial $trial idx $i: got $g want $w from $vs")
        }
      }
    }
  }

  test("A11: naps JSON aggregation sums positive durations") {
    val df = Seq(
      ("2022-01-08",
        """[{"start":"2022-01-08 00:33:10+0000","end":"2022-01-08 01:33:10+0000"},""" +
          """{"start":"2022-01-08 14:00:00+0000","end":"2022-01-08 14:30:00+0000"}]"""),
      ("2022-01-09", """[{"start":"2022-01-09 10:00:00+0000","end":"2022-01-09 09:00:00+0000"}]"""),
      ("2022-01-10", null))
      .toDF("date", "naps")
    val out = Intervals.napsDaily(df, "date", "naps").orderBy("date").collect()
    assert(math.abs(out(0).getAs[Double]("nap_hours") - 1.5) < 1e-9)
    assert(out(1).getAs[Double]("nap_hours") === 0.0) // negative dropped
    assert(out(2).getAs[Double]("nap_hours") === 0.0) // null-safe
  }

  test("C1: multi-format timestamp parse chain") {
    val df = Seq(
      "2025-08-03 01:44:43 +0100",
      "2024-01-15T10:30:45+00:00",
      "2024-01-15 10:30:45",
      "2024-01-15",
      "garbage").toDF("s")
    val parsed = df.select(TimeParse.parseTimestamp(col("s")).as("t")).collect()
    assert(parsed.count(_.isNullAt(0)) === 1)
    // offset honored: 01:44:43 +0100 == 00:44:43 UTC
    val first = df.limit(1).select(hour(TimeParse.parseTimestamp(col("s")))).head().getInt(0)
    assert(first === 0)
  }

  test("C2: timezone cutover switches the conversion zone at the date") {
    val df = Seq("2021-01-01 12:00:00", "2023-01-01 12:00:00").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    val out = df.select(hour(
      TimeParse.tzCutover(col("ts"), "2022-06-01", "Europe/Dublin", "America/New_York")))
      .collect().map(_.getInt(0))
    assert(out.toSeq === Seq(12, 7)) // Dublin winter = UTC; NY winter = UTC-5
  }

  test("C4: two-phase unit heuristic — decision from whole-column stat") {
    val minutes = Seq(400.0, 500.0, 480.0).toDF("v") // clearly minutes (max > 24)
    val maxV = minutes.agg(max("v")).head().getDouble(0)
    val hours = minutes.select(
      TimeParse.convertIf(col("v"), maxV > 24, 1.0 / 60.0).as("h"))
      .collect().map(_.getDouble(0))
    assert(math.abs(hours.head - 400.0 / 60) < 1e-12)
    val already = Seq(7.5, 8.0).toDF("v")
    val maxA = already.agg(max("v")).head().getDouble(0)
    val unchanged = already.select(TimeParse.convertIf(col("v"), maxA > 24, 1.0 / 60.0))
      .collect().map(_.getDouble(0))
    assert(unchanged.toSeq === Seq(7.5, 8.0))
  }

  test("W7: sequence arrays are ordered, complete-window-only, labeled") {
    val daily = (1 to 10).map(i => ("u", i, i * 1.0, i % 2)).toDF("k", "o", "x", "lab")
    val seqs = Enrich.sequenceArrays(daily, "k", "o", Seq("x"), "lab", k = 4)
    assert(seqs.count() === 7) // rows 4..10 have complete windows
    val first = seqs.orderBy("seq_end").head()
    assert(first.getAs[scala.collection.Seq[Double]]("seq_x") === Seq(1.0, 2.0, 3.0, 4.0))
    assert(first.getAs[Int]("y") === 0) // label of last element (o=4)
  }

  test("A8: last-by-timestamp wins; deterministic on ties via value") {
    val df = Seq(
      (1L, "2021-05-01 08:00:00", 0.1),
      (1L, "2021-05-01 22:00:00", 0.9),
      (1L, "2021-05-01 22:00:00", 0.4))
      .toDF("uid", "ts", "v").withColumn("ts", to_timestamp(col("ts")))
    val out = DailyAgg.dailyLastAndMean(df, Seq("uid"), "ts", "v", 0.25, -0.25).head()
    assert(out.getAs[Double]("last_score") === 0.9) // tie at 22:00 -> larger value
  }

  test("M1': median impute — group median, global fallback, zero fallback") {
    val df = Seq(
      ("g1", java.lang.Double.valueOf(1.0)), ("g1", java.lang.Double.valueOf(3.0)),
      ("g1", null.asInstanceOf[java.lang.Double]),
      ("g2", null.asInstanceOf[java.lang.Double]))
      .toDF("g", "x")
    val out = Impute.medianImpute(df, Seq("g"), Seq("x"))
    val g1 = out.filter(col("g") === "g1" && col("x") === 2.0).count()
    assert(g1 === 1) // null in g1 -> group median 2.0
    val g2 = out.filter(col("g") === "g2").select("x").head().getDouble(0)
    assert(g2 === 2.0) // all-null group -> global median
  }
}
