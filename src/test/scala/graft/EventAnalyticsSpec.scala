package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, TextAnalysis, Unify}

/** As-of join (J12), cohort retention / funnel (E3/E4), and exact heavy
  * hitters (t16) — semantics pinned on crafted fixtures where the expected
  * rows are hand-computable.
  */
class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    // (key, ts, px) — the right side; unique per (key, ts)
    ("a", ts("2024-01-01 10:00:00"), 1.0),
    ("a", ts("2024-01-01 10:00:10"), 2.0),
    ("a", ts("2024-01-01 10:05:00"), 3.0),
    ("b", ts("2024-01-01 09:00:00"), 9.0)
  ).toDF("k", "rts", "px")

  private lazy val trades = Seq(
    ("a", ts("2024-01-01 09:59:59"), 1L), // before any quote
    ("a", ts("2024-01-01 10:00:10"), 2L), // equal ts -> inclusive match
    ("a", ts("2024-01-01 10:04:00"), 3L), // between quotes
    ("a", ts("2024-01-01 11:00:00"), 4L), // long after the last quote
    ("b", ts("2024-01-01 09:00:01"), 5L),
    ("c", ts("2024-01-01 12:00:00"), 6L) // key with no right rows
  ).toDF("k", "ts", "id")

  test("asofJoin backward: nearest at-or-before, inclusive at equality") {
    val out = Unify.asofJoin(trades, quotes, Seq("k"), "ts", "rts", Seq("px"))
      .select("id", "px").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out === Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(2.0), 4L -> Some(3.0),
      5L -> Some(9.0), 6L -> None))
  }

  test("asofJoin forward: nearest at-or-after") {
    val out = Unify.asofJoin(trades, quotes, Seq("k"), "ts", "rts", Seq("px"),
        direction = "forward")
      .select("id", "px").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out === Map(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(3.0), 4L -> None,
      5L -> None, 6L -> None))
  }

  test("asofJoin tolerance nulls stale matches but keeps fresh ones") {
    val out = Unify.asofJoin(trades, quotes, Seq("k"), "ts", "rts", Seq("px"),
        toleranceSecs = Some(60L))
      .select("id", "px").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // id=4 matched px=3.0 at 10:05:00, 55 min stale -> nulled; id=3 is 230s
    // stale -> also nulled; id=2 exact match survives.
    assert(out === Map(
      1L -> None, 2L -> Some(2.0), 3L -> None, 4L -> None,
      5L -> Some(9.0), 6L -> None))
  }

  test("asofJoin preserves left row count and attaches matched ts") {
    val out = Unify.asofJoin(trades, quotes, Seq("k"), "ts", "rts", Seq("px"))
    assert(out.count() === trades.count())
    val m = out.filter(col("id") === 4L).select("asof_ts").head()
    assert(m.getTimestamp(0) === ts("2024-01-01 10:05:00"))
  }

  test("retentionCohorts: offset 0 holds the whole cohort; fractions exact") {
    val events = Seq(
      // cohort week of Mon 2024-01-01: u1 (active wk0+wk1), u2 (wk0 only)
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
      // cohort week of Mon 2024-01-08: u3
      (3L, ts("2024-01-10 10:00:00")), (3L, ts("2024-01-18 10:00:00"))
    ).toDF("user_id", "ts")
    val out = EventAnalytics.retentionCohorts(events, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> (2L, 1.0),
      ("2024-01-01", 1L) -> (1L, 0.5),
      ("2024-01-08", 0L) -> (1L, 1.0),
      ("2024-01-08", 1L) -> (1L, 1.0)))
  }

  test("asofJoin == naive range-join+rank on randomized data (all directions)") {
    // deterministic pseudo-random fixture: 300 left rows, 120 right rows,
    // 5 keys, timestamps colliding across sides often (xxhash-derived)
    val left = spark.range(300).selectExpr(
      "id", "cast(pmod(xxhash64(id, 'k'), 5) as string) AS k",
      "timestamp_seconds(1700000000 + pmod(xxhash64(id, 't'), 5000)) AS ts")
    val right = spark.range(120).selectExpr(
      "cast(pmod(xxhash64(id, 'rk'), 5) as string) AS k",
      "timestamp_seconds(1700000000 + pmod(xxhash64(id, 'rt'), 5000)) AS rts",
      "cast(id as double) AS v")
      // asofJoin contract: right unique per (key, ts)
      .groupBy("k", "rts").agg(max("v").as("v"))
    for (dir <- Seq("backward", "forward")) {
      val got = Unify.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"),
          direction = dir)
        .select("id", "v", "asof_ts")
      // naive oracle: range join + rank (the formulation asofJoin avoids)
      val cmp = if (dir == "backward") col("rts") <= col("ts")
                else col("rts") >= col("ts")
      val ord = if (dir == "backward") col("rts").desc else col("rts").asc
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(ord)
      val rr = right.withColumnRenamed("k", "rk")
      val naive = left.join(rr, col("rk") === left("k") && cmp, "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 || col("rts").isNull)
        .select(col("id"), col("v"), col("rts").as("asof_ts"))
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        s"asofJoin($dir) diverged from the naive range-join formulation")
    }
  }

  test("intervalJoin == naive range join on randomized intervals") {
    val a = spark.range(150).selectExpr(
      "id AS aid",
      "timestamp_seconds(1700000000 + pmod(xxhash64(id, 'as'), 3000)) AS a_s")
      .selectExpr("aid", "a_s",
        "a_s + make_interval(0, 0, 0, 0, 0, 0, pmod(xxhash64(aid, 'al'), 250)) AS a_e")
    val b = spark.range(150).selectExpr(
      "id AS bid",
      "timestamp_seconds(1700000000 + pmod(xxhash64(id, 'bs'), 3000)) AS b_s")
      .selectExpr("bid", "b_s",
        "b_s + make_interval(0, 0, 0, 0, 0, 0, pmod(xxhash64(bid, 'bl'), 250)) AS b_e")
    val got = Unify.intervalJoin(a, b, "a_s", "a_e", "b_s", "b_e",
        bucketSecs = 100L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = a.join(b,
        col("a_s").cast("long") <= col("b_e").cast("long") &&
        col("b_s").cast("long") <= col("a_e").cast("long"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
  }

  test("intervalJoin: overlap pairs exact-once across buckets, inclusive ends") {
    // bucket = 100s; intervals span 1-3 buckets so the responsibility
    // rule is exercised (a pair meeting in several buckets must emit once)
    val a = Seq(
      (1L, 50L, 250L),   // spans buckets 0..2
      (2L, 300L, 310L),  // bucket 3
      (3L, 400L, 450L)   // bucket 4
    ).toDF("aid", "s", "e")
      .select(col("aid"), col("s").cast("timestamp").as("a_s"),
        col("e").cast("timestamp").as("a_e"))
    val b = Seq(
      (10L, 0L, 260L),   // overlaps a1 in buckets 0,1,2 -> one row
      (11L, 250L, 300L), // touches a1 at 250 and a2 at 300 (inclusive)
      (12L, 460L, 500L)  // overlaps nothing
    ).toDF("bid", "s", "e")
      .select(col("bid"), col("s").cast("timestamp").as("b_s"),
        col("e").cast("timestamp").as("b_e"))
    val pairs = graft.operators.Unify.intervalJoin(
        a, b, "a_s", "a_e", "b_s", "b_e", bucketSecs = 100L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === pairs.distinct.length, "pair emitted twice")
    assert(pairs.toSet === Set((1L, 10L), (1L, 11L), (2L, 11L)))
  }

  test("rollingActiveUsers: exact DAU/WAU, window trailing, real dates only") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-05 10:00:00")),
      (3L, ts("2024-01-10 10:00:00"))
    ).toDF("user_id", "ts")
    val out = EventAnalytics.rollingActiveUsers(events, "user_id", "ts", 7)
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    // Jan 1: dau {1,2}, wau window [Dec26..Jan1] = {1,2}
    // Jan 5: dau {1}, wau [Dec30..Jan5] = {1,2}
    // Jan 10: dau {3}, wau [Jan4..Jan10] = {1,3} (Jan-1 activity aged out)
    assert(out === Map(
      "2024-01-01" -> (2L, 2L),
      "2024-01-05" -> (1L, 2L),
      "2024-01-10" -> (1L, 2L)))
  }

  test("funnel: strict order required, each step after the previous") {
    val events = Seq(
      // u1 completes the funnel in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "buy"),
      // u2 clicks BEFORE viewing -> click doesn't count; no buy
      (2L, ts("2024-01-01 10:00:00"), "click"),
      (2L, ts("2024-01-01 10:01:00"), "view"),
      // u3 views then buys without clicking -> stops at view
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:01:00"), "buy"),
      // u4 clicks twice: first click pre-view, second counts
      (4L, ts("2024-01-01 09:00:00"), "click"),
      (4L, ts("2024-01-01 10:00:00"), "view"),
      (4L, ts("2024-01-01 11:00:00"), "click")
    ).toDF("user_id", "ts", "et")
    val out = EventAnalytics.funnel(events, "user_id", "ts", "et",
        Seq("view", "click", "buy"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("view" -> 4L, "click" -> 2L, "buy" -> 1L))
  }

  test("funnel conversion window: steps beyond the anchor window don't count") {
    val events = Seq(
      // u1: view -> click within 1h, purchase 2h after view -> drops at buy
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "buy"),
      // u2: everything within the hour -> completes
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:10:00"), "click"),
      (2L, ts("2024-01-01 10:20:00"), "buy")
    ).toDF("user_id", "ts", "et")
    val out = EventAnalytics.funnel(events, "user_id", "ts", "et",
        Seq("view", "click", "buy"), withinSecs = Some(3600L))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("view" -> 2L, "click" -> 2L, "buy" -> 1L))
  }

  test("sessionPaths: gap splits sessions, path ordered and truncated") {
    val events = Seq(
      // u1 session 1: three events in order; session 2 after a >30min gap
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:10:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:20:00"), 3L, "buy"),
      (1L, ts("2024-01-01 12:00:00"), 4L, "view"),
      // u2: single-event session
      (2L, ts("2024-01-01 10:00:00"), 5L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.sessionPaths(events, "user_id", "ts", "event_id",
        "event_type", gapSecs = 1800L, maxPathEvents = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out === Map(
      "view>click>buy" -> (1L, 3.0),
      "view" -> (2L, 1.0)))
    // truncation: cap 2 keeps the FIRST two events but counts all three
    val trunc = EventAnalytics.sessionPaths(events, "user_id", "ts", "event_id",
        "event_type", gapSecs = 1800L, maxPathEvents = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(trunc === Map(
      "view>click" -> (1L, 3.0),
      "view" -> (2L, 1.0)))
  }

  test("sessionPaths: equal timestamps ordered by the tie column") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:00:00"), 1L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.sessionPaths(events, "user_id", "ts", "event_id",
        "event_type", gapSecs = 1800L)
      .collect().map(_.getString(0)).toSet
    assert(out === Set("a>b"))
  }

  test("transitionMatrix: within-session bigrams with per-src probabilities") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:00:10"), 2L, "click"),
      (1L, ts("2024-01-01 10:00:20"), 3L, "buy"),
      (1L, ts("2024-01-01 12:00:00"), 4L, "view"), // gap: buy->view excluded
      (2L, ts("2024-01-01 10:00:00"), 5L, "click"),
      (2L, ts("2024-01-01 10:05:00"), 6L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.transitionMatrix(events, "user_id", "ts",
        "event_id", "event_type", gapSecs = 1800L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out === Map(
      ("view", "click") -> (1L, 1.0),
      ("click", "buy") -> (1L, 0.5),
      ("click", "click") -> (1L, 0.5)))
  }

  test("rfm: quartile scores from exact boundaries, hand-computed") {
    def mk(u: Long, day: String, n: Int, purchase: Double) = {
      val base = (1 to n).map(i =>
        (u, ts(s"$day 10:0$i:00"), "view", 0.0))
      if (purchase > 0) base.updated(0, (u, ts(s"$day 10:01:00"), "purchase", purchase))
      else base
    }
    val events = (mk(1L, "2024-01-10", 4, 100.0) ++ mk(2L, "2024-01-09", 3, 0.0) ++
      mk(3L, "2024-01-08", 2, 0.0) ++ mk(4L, "2024-01-07", 1, 0.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = EventAnalytics.rfm(events, "user_id", "ts", "event_type",
        "value", "purchase")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7), r.getString(8))).toMap
    // recency [0,1,2,3] -> q=(0.75,1.5,2.25); freq [4,3,2,1] -> (1.75,2.5,3.25);
    // monetary [100,0,0,0] -> (0,0,25)
    assert(out === Map(
      1L -> (4, 4, 4, "444", "champion"),
      2L -> (3, 3, 1, "331", "regular"),
      3L -> (2, 2, 1, "221", "low_value"),
      4L -> (1, 1, 1, "111", "low_value")))
  }

  test("hashSplit: exhaustive, deterministic, stable under corpus growth") {
    val small = (1 to 300).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val splits = Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L)
    val a = TextAnalysis.hashSplit(small, "doc_id", splits)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.size === 300 && a.values.toSet.subsetOf(Set("train", "val", "test")))
    // ratio sanity (not exact — hash variance): train within [0.7, 0.9]
    val trainFrac = a.values.count(_ == "train") / 300.0
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
    // growth stability: same docs keep their split inside a larger corpus
    val big = (1 to 900).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val b = TextAnalysis.hashSplit(big, "doc_id", splits)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (id, s) => b(id) == s })
  }

  test("ewma: pandas adjust=True semantics incl. null positions, hand-computed") {
    // alpha=0.5, window=3, series [2, null, 4]:
    //   y1 = 2
    //   y2 = (0.5*2)/0.5 = 2           (null consumes its lag position)
    //   y3 = (0.25*2 + 1*4)/(0.25+1) = 3.6
    val df = Seq(
      (1L, 1, Some(2.0)), (1L, 2, None), (1L, 3, Some(4.0)),
      (2L, 1, Some(10.0))
    ).toDF("k", "ord", "x")
    val out = graft.operators.Enrich.ewma(df, "k", "ord", "x",
        alpha = 0.5, window = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        Option(r.get(r.fieldIndex("x_ewma")))).toMap
    assert(out === Map(
      (1L, 1) -> Some(2.0), (1L, 2) -> Some(2.0), (1L, 3) -> Some(3.6),
      (2L, 1) -> Some(10.0)))
  }

  test("kaplanMeier: hand-computed with censoring; censored rows keep S flat") {
    val events = Seq(
      // u1: enters 01-01, purchases 01-03 -> event at t=2
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-03 10:00:00"), "buy"),
      // u2: enters 01-01, never purchases -> censored at corpus end (01-06)
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-06 10:00:00"), "view"),
      // u3: enters and purchases 01-02 -> event at t=0
      (3L, ts("2024-01-02 10:00:00"), "buy"),
      // u4: enters 01-01, purchases 01-05 -> event at t=4
      (4L, ts("2024-01-01 10:00:00"), "view"),
      (4L, ts("2024-01-05 10:00:00"), "buy")
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.kaplanMeier(events, "user_id", "ts", "event_type", "buy")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out === Map(
      0L -> (1L, 0L, 4L, 0.75),     // u3 event, risk 4 -> 3/4
      2L -> (1L, 0L, 3L, 0.5),      // u1 event, risk 3 -> 0.75 * 2/3
      4L -> (1L, 0L, 2L, 0.25),     // u4 event, risk 2 -> 0.5 * 1/2
      5L -> (0L, 1L, 1L, 0.25)))    // u2 censored: S unchanged
  }

  test("kaplanMeier: everyone-events terminal row drives S to exactly 0") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "buy"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-02 10:00:00"), "buy")
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.kaplanMeier(events, "user_id", "ts", "event_type", "buy")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out === Map(0L -> 0.5, 1L -> 0.0))
  }

  test("rollingMedianMad: hand-computed med/mad/z, min_periods + mad=0 guards") {
    val df = Seq(
      (1L, 1, 1.0), (1L, 2, 2.0), (1L, 3, 100.0), (1L, 4, 3.0),
      (2L, 1, 5.0), (2L, 2, 5.0), (2L, 3, 9.0)
    ).toDF("k", "ord", "x")
    val out = graft.operators.Enrich.rollingMedianMad(df, "k", "ord", "x",
        k = 3, minPeriods = 2, zThresh = 2.0)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((Option(r.get(r.fieldIndex("x_med"))), Option(r.get(r.fieldIndex("x_mad"))),
          Option(r.get(r.fieldIndex("x_rz"))), r.getInt(r.fieldIndex("x_outlier"))))).toMap
    // u1 r2: win [1,2] -> med 1.5 (interpolated), mad 0.5
    assert(out((1L, 1)) === ((None, None, None, 0)), "below min_periods")
    assert(out((1L, 2))._1 === Some(1.5))
    assert(out((1L, 2))._2 === Some(0.5))
    // u1 r3: win [1,2,100] -> med 2, mad 1, rz = 98/1.4826 -> outlier
    assert(out((1L, 3))._1 === Some(2.0) && out((1L, 3))._2 === Some(1.0))
    assert(math.abs(out((1L, 3))._3.get.asInstanceOf[Double] - 98.0 / 1.4826) < 1e-5)
    assert(out((1L, 3))._4 === 1)
    // u1 r4: win [2,100,3] -> med 3, mad 1, rz 0 -> the spike does NOT
    // mask its neighbor (a windowed mean/std would)
    assert(out((1L, 4)) === ((Some(3.0), Some(1.0), Some(0.0), 0)))
    // u2 r3: win [5,5,9] -> mad 0 -> z null, flag 0 by the guard
    assert(out((2L, 3))._1 === Some(5.0) && out((2L, 3))._2 === Some(0.0))
    assert(out((2L, 3))._3 === None && out((2L, 3))._4 === 0)
  }

  test("heavyHitters is exact vs plain groupBy at the threshold boundary") {
    // 64 tokens of "hot", plus 60 distinct cold tokens, num/den=1/2 ->
    // threshold = ceil(124/2) = 62: only "hot" qualifies. Spread over
    // partitions so Misra-Gries summaries must merge across partitions.
    val docs = ((1 to 64).map(_ => "hot") ++ (1 to 60).map(i => s"cold$i"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(7)
    val out = TextAnalysis.heavyHitters(docs, "text", num = 1, den = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("hot" -> 64L))
  }

  test("heavyHitters matches exact counts on skewed multi-token docs") {
    val docs = (1 to 200).map { i =>
      val body =
        if (i % 2 == 0) "alpha beta alpha"
        else s"alpha gamma$i delta${i % 5}"
      (i.toLong, body)
    }.toDF("doc_id", "text").repartition(5)
    val got = TextAnalysis.heavyHitters(docs, "text", num = 1, den = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = docs.select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
    val total = toks.count()
    val threshold = (total * 1 + 9) / 10
    val expected = toks.groupBy("t").count()
      .filter(col("count") >= threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.contains("alpha"))
  }

  test("w13: seasonal identity — adjusted + seasonal == original, dow is 0=Monday") {
    // 2024-01-01 was a Monday
    val rnd = new scala.util.Random(7)
    val rows = (0 until 28).map { d =>
      (1L, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d)),
        math.rint(rnd.nextDouble() * 100) / 10.0)
    }
    val out = graft.operators.Enrich.seasonalDecompose(
        rows.toDF("user_id", "date", "v"), "user_id", "date", "v")
      .orderBy("date").collect()
    assert(out(0).getInt(3) === 0) // Monday
    assert(out(6).getInt(3) === 6) // Sunday
    out.foreach { r =>
      val v = r.getDouble(2)
      // adjusted + seasonal reconstructs the original up to the rounding
      assert(math.abs(r.getDouble(6) + r.getDouble(5) - v) < 2e-6)
      // residual == v - dow_mean
      assert(math.abs(r.getDouble(7) - (v - r.getDouble(4))) < 2e-6)
    }
    // each weekday's profile mean is the plain mean of its 4 samples
    val mondays = rows.zipWithIndex.filter(_._2 % 7 == 0).map(_._1._3)
    assert(math.abs(out(0).getDouble(4) - mondays.sum / 4) < 2e-6)
  }

  test("e11: no-touch, expired-touch, and same-ts purchases attribute deterministically") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: click then purchase inside the window
      (1L, 1L, t("2024-01-01 10:00:00"), "click", 0.0),
      (2L, 1L, t("2024-01-02 10:00:00"), "purchase", 5.0),
      // user 2: view, then purchase 8 days later -> expired -> organic
      (3L, 2L, t("2024-01-01 10:00:00"), "view", 0.0),
      (4L, 2L, t("2024-01-09 11:00:00"), "purchase", 7.0),
      // user 3: purchase with no touch at all -> organic
      (5L, 3L, t("2024-01-01 10:00:00"), "purchase", 1.0),
      // user 4: touch and purchase at the SAME ts — touch has lower
      // event_id, sorts first in the (ts, id) order, so it counts
      (6L, 4L, t("2024-01-03 09:00:00"), "click", 0.0),
      (7L, 4L, t("2024-01-03 09:00:00"), "purchase", 2.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = graft.operators.EventAnalytics.lastTouchAttribution(ev,
        "user_id", "event_id", "ts", "event_type", "value",
        Seq("click", "view"), "purchase", windowSecs = 7L * 86400)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("click") === ((2L, 7.0)))
    assert(out("organic") === ((2L, 8.0)))
    assert(!out.contains("view"))
  }
}
