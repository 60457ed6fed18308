package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.streaming.StreamingDaily
import graft.streaming.StreamingDaily.{SessionEvent, SessionOut}

/** Structured Streaming daily aggs + stateful sessionization, and the
  * multimodal binary-column plumbing (stubbed decode). */
class StreamingMultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming A2: watermarked daily stats over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val agg = StreamingDaily.dailyStats(df, "ts", "user_id", "value")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("daily_out").start()
    try {
      input.addData(
        (ts("2024-01-01 08:00:00"), 1L, 10.0),
        (ts("2024-01-01 09:00:00"), 1L, 20.0),
        (ts("2024-01-02 08:00:00"), 1L, 30.0))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM daily_out ORDER BY date").collect()
      assert(out.length === 2)
      assert(out(0).getAs[Double]("v_mean") === 15.0)
      assert(out(0).getAs[Long]("n") === 2)
      // late-ish data within watermark folds into the existing day
      input.addData((ts("2024-01-01 23:00:00"), 1L, 30.0))
      q.processAllAvailable()
      val out2 = spark.sql("SELECT * FROM daily_out ORDER BY date").collect()
      assert(out2(0).getAs[Long]("n") === 3)
    } finally q.stop()
  }

  test("streaming A2 append mode: watermark finalizes closed days") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val agg = StreamingDaily.dailyStats(df, "ts", "user_id", "value", watermark = "1 hour")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("daily_append").start()
    try {
      input.addData((ts("2024-01-01 08:00:00"), 1L, 10.0))
      q.processAllAvailable()
      // day 1 still open: nothing emitted in append mode
      assert(spark.table("daily_append").count() === 0)
      // event-time advances past day 1 + watermark -> day 1 finalizes
      input.addData((ts("2024-01-02 02:00:00"), 1L, 20.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-03 02:00:00"), 1L, 30.0))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM daily_append ORDER BY date").collect()
      assert(out.length >= 1)
      assert(out(0).getAs[java.sql.Date]("date").toString === "2024-01-01")
      assert(out(0).getAs[Long]("n") === 1)
    } finally q.stop()
  }

  test("streaming HLL: register table equals batch sketch; estimate identical") {
    import graft.operators.Sketches
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "term")
    val regs = StreamingDaily.streamingHllRegisters(df, "ts", "term")
    val q = regs.writeStream.outputMode("complete")
      .format("memory").queryName("hll_regs").start()
    try {
      // two micro-batches with overlap: the max-merge must fold them
      val b1 = (1 to 400).map(i => (ts("2024-01-01 08:00:00"), s"tok$i"))
      val b2 = (200 to 700).map(i => (ts("2024-01-01 14:00:00"), s"tok$i"))
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val streamRegs = spark.sql(
        "SELECT bucket, m_reg FROM hll_regs ORDER BY bucket").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      // batch registers over the union of both batches
      val batch = (b1 ++ b2).map(_._2).toDF("term").withColumn("grp", lit("d"))
      val batchRegs = Sketches.hllRegisters(batch, "grp", "term")
        .orderBy("bucket").collect().map(r => (r.getLong(1), r.getInt(2)))
      assert(streamRegs.toSeq === batchRegs.toSeq,
        "streaming register table must equal the batch sketch")
      // estimate path: identical input registers -> identical estimate
      val est = Sketches.hllEstimate(
          spark.table("hll_regs").select(lit("d").as("grp"), col("bucket"),
            col("m_reg")))
        .select("hll_estimate").collect().head.getDouble(0)
      val batchEst = Sketches.hllEstimate(Sketches.hllRegisters(batch, "grp", "term"))
        .select("hll_estimate").collect().head.getDouble(0)
      assert(est === batchEst)
      assert(math.abs(est - 700.0) / 700.0 < 0.1, s"estimate $est vs 700 distinct")
    } finally q.stop()
  }

  test("streaming Count-Min: cell table equals the batch sketch build") {
    import graft.operators.Sketches
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "term")
    val cells = StreamingDaily.streamingCountMinCells(df, "ts", "term")
    val q = cells.writeStream.outputMode("complete")
      .format("memory").queryName("cm_cells").start()
    try {
      input.addData((1 to 300).map(i => (ts("2024-01-01 08:00:00"), s"w${i % 40}")))
      q.processAllAvailable()
      input.addData((1 to 200).map(i => (ts("2024-01-01 14:00:00"), s"w${i % 25}")))
      q.processAllAvailable()
      val stream = spark.sql(
        "SELECT row_i, col_i, cell FROM cm_cells ORDER BY row_i, col_i").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      // batch cells over the union stream: explode each occurrence
      val batch = ((1 to 300).map(i => s"w${i % 40}") ++
          (1 to 200).map(i => s"w${i % 25}")).toDF("term")
        .select(explode(Sketches.cmCellsOf(col("term"))).as("rc"))
        .groupBy(col("rc.row_i").as("row_i"), col("rc.col_i").as("col_i"))
        .agg(count(lit(1)).as("cell"))
        .orderBy("row_i", "col_i").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      assert(stream.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("streaming D5: per-window PSI against a fixed reference, hand-computed") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val df = input.toDF().toDF("ts", "value")
    val psi = StreamingDaily.streamingPsi(df, "ts", "value",
      refBoundaries = Seq(10.0), refShares = Seq(0.5, 0.5))
    val q = psi.writeStream.outputMode("complete")
      .format("memory").queryName("psi_out").start()
    try {
      input.addData(
        // day 1 matches the reference 50/50 split -> PSI 0
        (ts("2024-01-01 08:00:00"), 5.0), (ts("2024-01-01 09:00:00"), 15.0),
        // day 2 drifts to 75/25 -> PSI = -0.25*ln(2/3) + 0.25*ln(2)
        (ts("2024-01-02 08:00:00"), 5.0), (ts("2024-01-02 09:00:00"), 5.0),
        (ts("2024-01-02 10:00:00"), 5.0), (ts("2024-01-02 11:00:00"), 15.0))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM psi_out ORDER BY date").collect()
      assert(out.length === 2)
      assert(out(0).getAs[Double]("psi") === 0.0)
      assert(out(0).getAs[Long]("n") === 2L)
      assert(out(1).getAs[Double]("psi") === 0.274653)
      assert(out(1).getAs[Long]("n") === 4L)
    } finally q.stop()
  }

  test("streaming W4: stateful gap sessionization across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = StreamingDaily.sessionize(input.toDS(), gapSeconds = 3600)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      input.addData(
        SessionEvent(1L, ts("2024-01-01 08:00:00"), 1.0),
        SessionEvent(1L, ts("2024-01-01 08:30:00"), 2.0))
      q.processAllAvailable()
      // gap > 1h in a later micro-batch closes the first session
      input.addData(SessionEvent(1L, ts("2024-01-01 12:00:00"), 5.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[SessionOut].collect()
      assert(closed.length === 1)
      assert(closed(0).n_events === 2)
      assert(closed(0).value_sum === 3.0)
    } finally q.stop()
  }

  test("streaming D6: CUSUM fold == reference recursion; split-invariant; restarts after alarm") {
    import StreamingDaily.{CusumEvent, CusumState, cusumStep}
    val mu = 2.0; val kappa = 0.5; val h = 4.0
    val vals = Seq(2.0, 2.1, 1.9, 6.0, 6.0, 2.0, 2.0, 7.0, 7.0)
    val evs = vals.zipWithIndex.map { case (v, i) =>
      CusumEvent(1L, ts(f"2024-01-01 08:00:${i}%02d"), v) }
    // reference recursion with post-alarm restart
    var s = 0.0; var alarms = 0
    vals.foreach { v =>
      s = math.max(0.0, s + v - mu - kappa)
      if (s > h) { alarms += 1; s = 0.0 } }
    val (stAll, outAll) = cusumStep(1L, evs, None, mu, kappa, h)
    // hand-trace: 6.0,6.0 fires (3.5+3.5), resets; 7.0 fires (4.5),
    // resets; the second 7.0 fires again on fresh evidence
    assert(outAll.length === alarms && alarms === 3)
    assert(stAll.get.nSeen === vals.length)
    assert(math.abs(stAll.get.s - s) < 1e-12)
    // arbitrary micro-batch split replays to the identical alarm set
    (1 until evs.length).foreach { cut =>
      val (st1, o1) = cusumStep(1L, evs.take(cut), None, mu, kappa, h)
      val (st2, o2) = cusumStep(1L, evs.drop(cut), st1, mu, kappa, h)
      assert(o1 ++ o2 === outAll, s"split at $cut diverged")
      assert(st2 === stAll)
    }
  }

  test("streaming interval join: cross-batch pairing equals the batch join, bound respected") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val joined = StreamingDaily.streamingIntervalJoin(
      clicks.toDS().toDF("user_id", "ts"), buys.toDS().toDF("user_id", "ts"),
      "user_id", "ts", windowSecs = 3600, watermarkDelay = "2 hours")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("sj_out").start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // purchases arrive in a LATER micro-batch; the buffered left state
      // still pairs them — that's the stream-stream join's whole point
      buys.addData(
        (1L, ts("2024-01-01 10:30:00")), // inside the hour
        (1L, ts("2024-01-01 12:30:00")), // outside the bound
        (2L, ts("2024-01-01 09:30:00")), // before the click
        (3L, ts("2024-01-01 10:30:00"))) // no matching click key
      q.processAllAvailable()
      val got = spark.table("sj_out")
        .select("user_id", "left_ts", "right_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString)).toSet
      assert(got === Set(
        (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:30:00.0")))
    } finally q.stop()
  }

  test("streaming D6: end-to-end alarms over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingDaily.{CusumAlarm, CusumEvent}
    val input = MemoryStream[CusumEvent]
    val alarms = StreamingDaily.streamingCusum(input.toDS(), mu = 1.0,
      kappa = 0.2, h = 3.0)
    val q = alarms.writeStream.outputMode("append")
      .format("memory").queryName("cusum_out").start()
    try {
      input.addData(
        CusumEvent(1L, ts("2024-01-01 08:00:00"), 1.0),
        CusumEvent(1L, ts("2024-01-01 08:00:01"), 1.1))
      q.processAllAvailable()
      assert(spark.table("cusum_out").count() === 0)
      // the shift arrives in a later micro-batch; state carries the fold
      input.addData(
        CusumEvent(1L, ts("2024-01-01 08:00:02"), 4.0),
        CusumEvent(1L, ts("2024-01-01 08:00:03"), 4.0))
      q.processAllAvailable()
      val got = spark.table("cusum_out").as[CusumAlarm].collect()
      assert(got.length === 1)
      assert(got(0).user_id === 1L && got(0).n_seen === 4L)
    } finally q.stop()
  }

  test("streaming W4: idle-timeout flush path — pure state machine") {
    import StreamingDaily.{sessionFlush, sessionStep, SessionState}
    // batch 1: two events 30min apart -> one open session, nothing emitted
    val (st1, out1) = sessionStep(1L, Seq(
      SessionEvent(1L, ts("2024-01-01 08:00:00"), 1.0),
      SessionEvent(1L, ts("2024-01-01 08:30:00"), 2.0)), None, gapSeconds = 3600)
    assert(out1.isEmpty)
    assert(st1.count === 2 && st1.sum === 3.0)
    // idle timeout fires -> the open session flushes with closed=false
    val flushed = sessionFlush(1L, st1)
    assert(flushed === Some(StreamingDaily.SessionOut(1L, 1L, 2L, 3.0, closed = false)))
    // empty state (key seen but no events folded) flushes nothing
    assert(sessionFlush(1L, SessionState(0L, Long.MinValue, 0L, 0.0)) === None)
    // a later batch after a gap closes the session instead (closed=true)
    val (st2, out2) = sessionStep(1L,
      Seq(SessionEvent(1L, ts("2024-01-01 12:00:00"), 5.0)), Some(st1), 3600)
    assert(out2 === Seq(StreamingDaily.SessionOut(1L, 1L, 2L, 3.0, closed = true)))
    assert(st2.sessionId === 2L && st2.count === 1L)
  }

  test("streaming W4: timeout tombstone preserves session numbering; second timeout reclaims") {
    import StreamingDaily.{sessionStep, sessionTimeout, SessionState}
    val (st1, _) = sessionStep(1L, Seq(
      SessionEvent(1L, ts("2024-01-01 08:00:00"), 1.0)), None, gapSeconds = 3600)
    assert(st1.sessionId === 1L)
    // first timeout: session 1 flushes, counter survives in a tombstone
    val (tomb, out) = sessionTimeout(1L, st1)
    assert(out === Some(StreamingDaily.SessionOut(1L, 1L, 1L, 1.0, closed = false)))
    assert(tomb.exists(t => t.sessionId === 1L && t.count === 0L))
    // the key resumes: the next session is 2, NOT a duplicate 1
    val (st2, out2) = sessionStep(1L,
      Seq(SessionEvent(1L, ts("2024-01-01 12:00:00"), 5.0)), tomb, 3600)
    assert(out2.isEmpty && st2.sessionId === 2L && st2.count === 1L)
    // second consecutive timeout on a tombstone: nothing to flush, state dropped
    assert(sessionTimeout(1L, tomb.get) === ((None, None)))
  }

  test("streaming dedup: first arrival kept, later duplicates dropped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val deduped = StreamingDaily.streamingExactDedup(df, "ts", "text")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData(
        (ts("2024-01-01 08:00:00"), 1L, "alpha beta"),
        (ts("2024-01-01 09:00:00"), 2L, "gamma delta"))
      q.processAllAvailable()
      // a duplicate of doc 1 in a LATER micro-batch must be dropped
      input.addData(
        (ts("2024-01-01 10:00:00"), 3L, "alpha beta"),
        (ts("2024-01-01 11:00:00"), 4L, "epsilon"))
      q.processAllAvailable()
      val out = spark.sql("SELECT doc_id FROM dedup_out ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(out == Seq(1L, 2L, 4L), s"got $out")
    } finally q.stop()
  }

  test("streaming near-dup: same-simhash variants dropped, distinct docs kept") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val deduped = StreamingDaily.streamingSimhashDedup(df, "ts", "text")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("simdedup_out").start()
    try {
      input.addData(
        (ts("2024-01-01 08:00:00"), 1L, "alpha beta gamma delta"),
        (ts("2024-01-01 09:00:00"), 2L, "wholly different tokens here"))
      q.processAllAvailable()
      // reordered token multiset -> identical simhash -> dropped in a
      // later micro-batch; a genuinely distinct doc passes
      input.addData(
        (ts("2024-01-01 10:00:00"), 3L, "delta gamma beta alpha"),
        (ts("2024-01-01 11:00:00"), 4L, "unrelated fresh content"))
      q.processAllAvailable()
      val out = spark.sql("SELECT doc_id, sim_sig FROM simdedup_out ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(out.map(_._1).toSeq == Seq(1L, 2L, 4L), s"got ${out.toSeq}")
      // the emitted signature matches the batch operator's (one engine,
      // two execution modes — downstream banding composes either way)
      val batchSig = spark.createDataFrame(Seq(Tuple1("alpha beta gamma delta")))
        .toDF("text")
        .select(graft.operators.Dedup.simhashOverHashed(
          graft.operators.Dedup.hashedTokens(org.apache.spark.sql.functions.col("text")), 64))
        .collect().head.getLong(0)
      assert(out.find(_._1 == 1L).map(_._2).contains(batchSig))
    } finally q.stop()
  }

  test("streaming near-dup: state rows EVICT once the watermark passes the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val deduped = StreamingDaily.streamingSimhashDedup(df, "ts", "text",
      watermark = "1 day")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("simdedup_evict").start()
    def stateRows: Long = {
      // last progress entry that actually ran the stateful operator
      val ps = q.recentProgress.filter(_.stateOperators.nonEmpty)
      assert(ps.nonEmpty, "no stateful progress recorded")
      ps.last.stateOperators.head.numRowsTotal
    }
    try {
      // 3 distinct signatures on Jan 1 -> 3 state entries
      input.addData(
        (ts("2024-01-01 08:00:00"), 1L, "alpha beta"),
        (ts("2024-01-01 09:00:00"), 2L, "gamma delta"),
        (ts("2024-01-01 10:00:00"), 3L, "epsilon zeta"))
      q.processAllAvailable()
      val afterB1 = stateRows
      assert(afterB1 === 3L, s"expected 3 state rows after batch 1, got $afterB1")
      // Jan 10 arrival: the data batch itself still carries the old
      // watermark, so its progress reports the peak of 4 state rows;
      // the watermark then advances to Jan 9 08:00 and the engine's
      // follow-up (no-data) batch evicts every Jan 1 entry (expiry =
      // arrival + 1 day <= Jan 2 10:00). processAllAvailable spans both,
      // so we see peak 4 in the progress history and 1 at the end.
      // This is the empirical half of the dropDuplicatesWithinWatermark
      // contract: bounded state, not just API shape.
      input.addData((ts("2024-01-10 08:00:00"), 4L, "eta theta"))
      q.processAllAvailable()
      val peak = q.recentProgress.filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.head.numRowsTotal).max
      assert(peak === 4L, s"expected peak of 4 state rows (3 old + 1 new), got $peak")
      val afterB2 = stateRows
      assert(afterB2 === 1L,
        s"expected Jan-1 state evicted (1 row: doc 4), got $afterB2")
      // a further in-horizon arrival grows state again — eviction didn't
      // just wipe everything
      input.addData((ts("2024-01-10 09:00:00"), 5L, "iota kappa"))
      q.processAllAvailable()
      val afterB3 = stateRows
      assert(afterB3 === 2L,
        s"expected 2 in-horizon state rows (docs 4 and 5), got $afterB3")
    } finally q.stop()
  }

  test("streaming corpus ops: quality gate + chunking run stateless on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    // per-row corpus ops compose on a streaming frame unchanged: quality
    // filter then overlapping chunking (both shuffle-free projections)
    val chunked = graft.operators.TextAnalysis.chunkDocuments(
      graft.operators.TextAnalysis.qualityColumns(df, "text")
        .filter(col("quality_score") >= 30.0),
      "doc_id", "text", chunkTokens = 10, overlapTokens = 3)
    val q = chunked.writeStream.outputMode("append")
      .format("memory").queryName("chunk_out").start()
    try {
      input.addData(
        (1L, (1 to 25).map(i => s"tok$i").mkString(" ")),
        (2L, "!!! ??? ;;; ###")) // junk: filtered before chunking
      q.processAllAvailable()
      input.addData((3L, (1 to 8).map(i => s"w$i").mkString(" ")))
      q.processAllAvailable()
      val out = spark.sql(
          "SELECT doc_id, chunk_id FROM chunk_out ORDER BY doc_id, chunk_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // doc 1: starts 0/7/14/21 (25 tokens); doc 2 gone; doc 3 one chunk
      assert(out === Seq((1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L), (3L, 0L)),
        s"got $out")
    } finally q.stop()
  }

  test("multimodal: stub decode is deterministic, null-safe, schema-stable") {
    val media = Seq(
      (1L, "image", "abcdef".getBytes("UTF-8"), 2, 3, 0, 0),
      (2L, "image", null.asInstanceOf[Array[Byte]], 0, 0, 0, 0))
      .toDF("media_id", "modality", "payload", "width", "height", "sample_rate", "n_frames")
    val out = Multimodal.extractFeatures(media, dims = 4)
    assert(out.schema.fieldNames.contains("features"))
    val rows = out.orderBy("media_id").collect()
    val f1 = rows(0).getAs[scala.collection.Seq[Float]]("features")
    assert(f1.length === 4)
    assert(rows(1).isNullAt(rows(1).fieldIndex("features")))
    // determinism: same payload -> same features
    val again = Multimodal.extractFeatures(media, dims = 4)
      .orderBy("media_id").collect()(0).getAs[scala.collection.Seq[Float]]("features")
    assert(again.toSeq === f1.toSeq)
  }

  test("multimodal: frame sampling slices payload by stride") {
    val payload = (0 until 100).map(_.toByte).toArray
    val media = Seq((7L, "video", payload, 0, 0, 0, 10))
      .toDF("media_id", "modality", "payload", "width", "height", "sample_rate", "n_frames")
    val frames = Multimodal.sampleFrames(media, stride = 3).collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 3, 6, 9))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length === 10))
  }

  test("multimodal: frameStats checksums match the sliced bytes exactly") {
    // payload 0..99, 10 frames of 10 bytes; stride 2 keeps 0,2,4,6,8
    val payload = (0 until 100).map(_.toByte).toArray
    val media = Seq((7L, "video", payload, 0, 0, 0, 10))
      .toDF("media_id", "modality", "payload", "width", "height", "sample_rate", "n_frames")
    val stats = Multimodal.frameStats(Multimodal.sampleFrames(media, stride = 2))
      .orderBy("frame_idx").collect()
    assert(stats.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2, 4, 6, 8))
    stats.foreach { r =>
      val f = r.getAs[Int]("frame_idx")
      assert(r.getAs[Long]("frame_len") === 10L)
      // frame f covers bytes 10f..10f+9: sum = 10*(10f) + 45
      assert(r.getAs[Long]("byte_sum") === 100L * f + 45L)
      assert(r.getAs[Int]("first_byte") === 10 * f)
      assert(r.getAs[Int]("last_byte") === 10 * f + 9)
    }
    // remainder bytes past n_frames*frameLen are dropped, not absorbed:
    // 23 bytes / 4 frames -> frameLen 5, frames at 0,10 with stride 2,
    // bytes 20..22 belong to no frame
    val ragged = Seq((8L, "video", (0 until 23).map(_.toByte).toArray, 0, 0, 0, 4))
      .toDF("media_id", "modality", "payload", "width", "height", "sample_rate", "n_frames")
    val rs = Multimodal.frameStats(Multimodal.sampleFrames(ragged, stride = 2))
      .orderBy("frame_idx").collect()
    assert(rs.map(r => (r.getAs[Int]("frame_idx"), r.getAs[Long]("frame_len"),
      r.getAs[Int]("first_byte"), r.getAs[Int]("last_byte"))).toSeq ===
      Seq((0, 5L, 0, 4), (2, 5L, 10, 14)))
  }

  test("multimodal: sceneCuts — jump over threshold is a cut, first frame never is") {
    // media 1: means 10, 11, 210 -> diffs (null), 1, 199 -> one cut at
    // frame 4; media 2: single frame -> no diffs, null mean_diff
    val stats = Seq(
      (1L, 0, 4L, 40L), (1L, 2, 4L, 44L), (1L, 4, 4L, 840L),
      (2L, 0, 5L, 50L))
      .toDF("media_id", "frame_idx", "frame_len", "byte_sum")
    val out = Multimodal.sceneCuts(stats, threshold = 100.0)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_frames_sampled") === 3)
    assert(out(1L).getAs[Long]("n_cuts") === 1)
    assert(out(1L).getAs[Int]("first_cut_idx") === 4)
    assert(math.abs(out(1L).getAs[Double]("mean_diff") - 100.0) < 1e-6)
    assert(out(2L).getAs[Long]("n_cuts") === 0)
    assert(out(2L).isNullAt(out(2L).fieldIndex("first_cut_idx")))
    assert(out(2L).isNullAt(out(2L).fieldIndex("mean_diff")))
  }

  test("multimodal: PCM16 stats — LE unpack incl. negatives, truncated tail, null payload") {
    val samples = Seq(100, -100, 50, -50)
    val b = new Array[Byte](2 * samples.length + 1) // odd trailing byte
    samples.zipWithIndex.foreach { case (x, i) =>
      b(2 * i) = (x & 0xff).toByte
      b(2 * i + 1) = ((x >> 8) & 0xff).toByte
    }
    b(b.length - 1) = 0x7f // must be ignored, not read as a sample
    val media = Seq((1L, b), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    val out = Multimodal.pcmStats(media, "payload")
      .select("media_id", "n_samples", "rms", "zcr", "peak")
      .orderBy("media_id").collect()
    assert(out(0).getLong(1) === 4L)
    // rms = sqrt((100²+100²+50²+50²)/4) = sqrt(6250)
    assert(math.abs(out(0).getDouble(2) - math.sqrt(6250.0)) < 1e-5)
    // every adjacent pair flips sign: zcr = 3/3
    assert(out(0).getDouble(3) === 1.0)
    assert(out(0).getInt(4) === 100)
    // null payload: all stat columns null
    assert(out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(4))
  }

  test("multimodal: resize re-buckets features to the target dim") {
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "features")
    val out = Multimodal.resizeFeatures(df, "features", 5)
      .select("features").head().getAs[scala.collection.Seq[Float]](0)
    assert(out.length === 5)
    assert(out.toSeq === Seq(1.0f, 2.0f, 3.0f, 1.0f, 2.0f))
  }

  test("multimodal REAL decode: PNG/JPEG/GIF headers from genuine codec bytes") {
    import graft.multimodal.Multimodal.{decodeImageHeader, encodeTestImage, ImageHeader}
    // genuine PNG/JPEG bytes from the JDK encoder, at asymmetric dims so
    // a width/height swap would be caught
    assert(decodeImageHeader(encodeTestImage(5L, "png", 17, 9))
      === Some(ImageHeader("png", 17, 9, 3)))
    assert(decodeImageHeader(encodeTestImage(6L, "jpg", 31, 2))
      === Some(ImageHeader("jpeg", 31, 2, 3)))
    assert(decodeImageHeader(encodeTestImage(7L, "gif", 12, 4))
      === Some(ImageHeader("gif", 12, 4, 3)))
    // grayscale PNG -> 1 channel (colour type 0)
    val grey = new java.awt.image.BufferedImage(5, 6,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(grey, "png", out)
    assert(decodeImageHeader(out.toByteArray) === Some(ImageHeader("png", 5, 6, 1)))
    // garbage / truncation / null never throw
    assert(decodeImageHeader(null) === None)
    assert(decodeImageHeader(Array[Byte]()) === None)
    assert(decodeImageHeader("not an image at all".getBytes("UTF-8")) === None)
    assert(decodeImageHeader(encodeTestImage(5L, "png", 17, 9).take(12)) === None)
    assert(decodeImageHeader(encodeTestImage(6L, "jpg", 31, 2).take(4)) === None)
  }

  test("multimodal REAL pixel decode: ImageIO raster -> 8x8 gray thumbnail") {
    import graft.multimodal.Multimodal
    import Multimodal.encodeTestImage
    // the generator's pixel/luma formula, recomputed independently
    def luma(seed: Long, x: Int, y: Int): Long = {
      val v = (seed * 31 + x * 7 + y * 13) & 0xffffff
      299L * ((v >> 16) & 0xff) + 587L * ((v >> 8) & 0xff) + 114L * (v & 0xff)
    }
    def cell(seed: Long, w: Int, h: Int, ci: Int, cj: Int): Double = {
      val x0 = cj * w / 8; val x1 = math.min(math.max((cj + 1) * w / 8, x0 + 1), w)
      val y0 = ci * h / 8; val y1 = math.min(math.max((ci + 1) * h / 8, y0 + 1), h)
      val px = for (y <- y0 until y1; x <- x0 until x1) yield luma(seed, x, y)
      px.sum.toDouble / (1000.0 * px.size)
    }
    val media = Seq(
      (1L, encodeTestImage(1L, "png", 1, 1)), // smaller than the thumbnail
      (2L, encodeTestImage(2L, "png", 13, 7)), // asymmetric, multi-pixel cells
      (3L, null.asInstanceOf[Array[Byte]]), // null payload
      (4L, "not an image at all".getBytes("UTF-8"))) // garbage payload
      .toDF("media_id", "payload")
    val out = Multimodal.decodePixels(media, "payload").orderBy("media_id").collect()
    // 1x1 upsamples: every cell is the single pixel's luma
    assert(out(0).getAs[Int]("px_width") === 1)
    assert(out(0).getAs[Int]("px_height") === 1)
    val t1 = out(0).getAs[scala.collection.Seq[Double]]("gray_thumb")
    assert(t1.length === 64)
    assert(t1.forall(_ === cell(1L, 1, 1, 0, 0)))
    // 13x7: corners + center match the independent recompute (lossless
    // PNG round-trip means the decoded raster IS the formula)
    val t2 = out(1).getAs[scala.collection.Seq[Double]]("gray_thumb")
    assert(out(1).getAs[Int]("px_width") === 13)
    assert(out(1).getAs[Int]("px_height") === 7)
    for ((ci, cj) <- Seq((0, 0), (0, 7), (3, 3), (7, 0), (7, 7)))
      assert(t2(ci * 8 + cj) === cell(2L, 13, 7, ci, cj), s"cell ($ci,$cj)")
    // undecodable payloads -> null decode columns, rows preserved
    for (i <- Seq(2, 3)) {
      assert(out(i).isNullAt(out(i).fieldIndex("px_width")))
      assert(out(i).isNullAt(out(i).fieldIndex("gray_thumb")))
    }
  }

  test("multimodal aHash: signature parity with the formula; null-safe; collisions real") {
    import graft.multimodal.Multimodal
    import Multimodal.encodeTestImage
    // independent reimplementation: formula pixels -> integer pooling ->
    // milli-luma threshold -> packed halves (no codec involved)
    def expected(seed: Long, w: Int, h: Int): (Long, Long) = {
      def luma(x: Int, y: Int): Long = {
        val v = (seed * 31 + x * 7 + y * 13) & 0xffffff
        299L * ((v >> 16) & 0xff) + 587L * ((v >> 8) & 0xff) + 114L * (v & 0xff)
      }
      val m = for (ci <- 0 until 8; cj <- 0 until 8) yield {
        val x0 = cj * w / 8; val x1 = math.min(math.max((cj + 1) * w / 8, x0 + 1), w)
        val y0 = ci * h / 8; val y1 = math.min(math.max((ci + 1) * h / 8, y0 + 1), h)
        val px = for (y <- y0 until y1; x <- x0 until x1) yield luma(x, y)
        px.sum / px.size
      }
      val tot = m.sum
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64 if 64L * m(k) > tot)
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      (hi, lo)
    }
    val media = Seq(
      (1L, encodeTestImage(1L, "png", 13, 7)),
      (2L, encodeTestImage(2L, "png", 5, 3)),
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, "garbage".getBytes("UTF-8"))).toDF("media_id", "payload")
    val out = Multimodal.aHash64(media, "payload").orderBy("media_id").collect()
    for ((row, (seed, w, h)) <- out.take(2).zip(Seq((1L, 13, 7), (2L, 5, 3)))) {
      val (hi, lo) = expected(seed, w, h)
      assert(row.getAs[Long]("sig_hi") === hi, s"seed $seed hi")
      assert(row.getAs[Long]("sig_lo") === lo, s"seed $seed lo")
    }
    for (i <- Seq(2, 3)) {
      assert(out(i).isNullAt(out(i).fieldIndex("sig_hi")))
      assert(out(i).isNullAt(out(i).fieldIndex("sig_lo")))
    }
    assert(out(0).getAs[Int]("px_width") === 13)
    // real collisions: the gradient structure is shared across seeds at
    // equal dims whenever channel levels shift without wrapping — find a
    // colliding seed pair with the pure-Scala recompute, then pin that
    // the engine (through the actual PNG codec) collides on it too
    val sigs = (0L until 40L).map(s0 => s0 -> expected(s0, 13, 7))
    val pair = sigs.groupBy(_._2).values.find(_.size > 1).map(_.map(_._1))
    assert(pair.isDefined, "no colliding seed pair in 40 candidates")
    val Seq(s1, s2) = pair.get.take(2).toSeq
    val coll = Multimodal.aHash64(
        Seq((s1, encodeTestImage(s1, "png", 13, 7)),
          (s2, encodeTestImage(s2, "png", 13, 7))).toDF("media_id", "payload"),
        "payload").select("sig_hi", "sig_lo").collect()
    assert(coll(0) === coll(1), s"engine must collide on seeds $s1/$s2")
  }

  test("multimodal audio fingerprint: parity with hand recompute; volume-invariant; null-safe") {
    import graft.multimodal.Multimodal
    def pcm(samples: Seq[Int]): Array[Byte] = {
      val b = new Array[Byte](2 * samples.size)
      samples.zipWithIndex.foreach { case (x, i) =>
        b(2 * i) = (x & 0xff).toByte
        b(2 * i + 1) = ((x >> 8) & 0xff).toByte
      }
      b
    }
    // 12 samples -> 3 windows; energies 4*1, 4*100, 4*25 -> bits: e1>e0 (1),
    // e2>e1 (0) -> fp = 0b01 = 1
    val base = Seq(1, -1, 1, -1, 10, -10, 10, -10, 5, -5, 5, -5)
    val media = Seq(
      (1L, pcm(base)),
      (2L, pcm(base.map(_ * 3))), // uniformly re-leveled copy
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, pcm(Seq(7, 8, 9)))) // < one window
      .toDF("media_id", "payload")
    val out = Multimodal.audioFingerprint(media, "payload")
      .orderBy("media_id").collect()
    assert(out(0).getAs[Int]("n_windows") === 3)
    assert(out(0).getAs[Long]("fp") === 1L)
    // volume scaling multiplies every energy by 9: identical delta signs
    assert(out(1).getAs[Int]("n_windows") === 3)
    assert(out(1).getAs[Long]("fp") === out(0).getAs[Long]("fp"))
    assert(out(2).isNullAt(out(2).fieldIndex("fp")))
    assert(out(3).isNullAt(out(3).fieldIndex("fp")),
      "sub-window payload must yield null, not a zero-window fingerprint")
  }

  test("mm12 temporal video hash: parity with direct byte recompute; planted near-dup regime") {
    import graft.queries.TextQueries
    val ids = (0L until 200L).toSeq.toDF("doc_id")
    val fps = TextQueries.mm12DocFps(ids).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    // independent reference: recompute every fingerprint straight from
    // the committed payload BYTES (not the formula the fixture shares
    // with the twin) — a demux slicing bug, a stride slip, or a window
    // mis-order in mm12DocFps diverges here even if fixture and twin
    // agree
    val payloads = TextQueries.mm12Media(ids).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getInt(2)))
    payloads.foreach { case (id, payload, nf) =>
      val fl = payload.length / nf
      val sums = (0 until nf).map(f =>
        (0 until fl).map(j => payload(f * fl + j) & 0xff).sum.toLong)
      var expFp = 0L
      (0 until nf - 1).foreach { f =>
        if (sums(f + 1) > sums(f)) expFp |= 1L << f
      }
      assert(fps(id) === ((nf, expFp)),
        s"doc $id: engine fp disagrees with byte recompute")
    }
    // planted regime over the 50 groups: variants collapse equal or land
    // within the radius for most pairs, with SOME distinct-sig pairs in
    // hamming 1..3 (the banded join's positive path) and a beyond-radius
    // tail (the verify filter's negative path)
    val byGroup = fps.toSeq.groupBy { case (id, _) => id / 4 }
    val hs = byGroup.values.flatMap { docs =>
      docs.combinations(2).map { case Seq((_, (_, a)), (_, (_, b))) =>
        java.lang.Long.bitCount(a ^ b)
      }
    }.toSeq
    assert(hs.count(_ == 0) > 0, "no equal-fp collapse in the fixture")
    assert(hs.count(h => h >= 1 && h <= 3) > 0,
      "no distinct-sig near-dups within the verify radius")
    assert(hs.count(_ > 3) > 0, "no beyond-radius variant pairs")
    // the signature space grows with the corpus: far more distinct
    // (n_frames, fp) keys than the 8 frame-count blocks
    assert(fps.values.toSet.size > 50,
      "fingerprint space saturated — fixture regressed to mm9's seed-only trap")
  }

  test("streaming funnel: pure state machine — order, window, dedupe, completion") {
    import StreamingDaily.{funnelStep, FunnelEvent, FunnelState}
    val steps = Seq("view", "click", "buy")
    // out-of-order arrival within a batch is sorted by event time: the
    // click BEFORE the first view doesn't advance
    val (st1, out1) = funnelStep(1L, Seq(
      FunnelEvent(1L, ts("2024-01-01 10:05:00"), "click"),
      FunnelEvent(1L, ts("2024-01-01 10:00:00"), "click"),
      FunnelEvent(1L, ts("2024-01-01 10:02:00"), "view")),
      None, steps, withinSecs = Some(3600L))
    assert(out1.map(o => (o.step_idx, o.step)) === Seq((0L, "view"), (1L, "click")))
    assert(st1.exists(_.stepIdx === 1))
    // a buy in the NEXT batch advances from carried state; a second buy
    // after completion emits nothing (state retained, no re-entry)
    val (st2, out2) = funnelStep(1L, Seq(
      FunnelEvent(1L, ts("2024-01-01 10:30:00"), "buy"),
      FunnelEvent(1L, ts("2024-01-01 10:40:00"), "buy")),
      st1, steps, withinSecs = Some(3600L))
    assert(out2.map(_.step_idx) === Seq(2L))
    assert(st2.exists(_.stepIdx === 2))
    val (st3, out3) = funnelStep(1L, Seq(
      FunnelEvent(1L, ts("2024-01-01 10:50:00"), "view")),
      st2, steps, withinSecs = Some(3600L))
    assert(out3.isEmpty && st3 === st2)
    // conversion window: a buy past anchor+1h does NOT advance
    val (_, out4) = funnelStep(2L, Seq(
      FunnelEvent(2L, ts("2024-01-01 10:00:00"), "view"),
      FunnelEvent(2L, ts("2024-01-01 10:10:00"), "click"),
      FunnelEvent(2L, ts("2024-01-01 11:30:00"), "buy")),
      None, steps, withinSecs = Some(3600L))
    assert(out4.map(_.step_idx) === Seq(0L, 1L))
    // equal timestamp does not satisfy strictly-after
    val (_, out5) = funnelStep(3L, Seq(
      FunnelEvent(3L, ts("2024-01-01 10:00:00"), "view"),
      FunnelEvent(3L, ts("2024-01-01 10:00:00"), "click")),
      None, steps, None)
    assert(out5.map(_.step_idx) === Seq(0L))
    // a user who never enters holds no state
    val (stNone, outNone) = funnelStep(4L, Seq(
      FunnelEvent(4L, ts("2024-01-01 10:00:00"), "click")),
      None, steps, None)
    assert(stNone.isEmpty && outNone.isEmpty)
  }

  test("streaming funnel: end-to-end over a memory stream across batches") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingDaily.{FunnelEvent, FunnelOut}
    val input = MemoryStream[FunnelEvent]
    val out = StreamingDaily.streamingFunnel(input.toDS(),
      Seq("view", "click", "buy"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    try {
      input.addData(
        FunnelEvent(1L, ts("2024-01-01 10:00:00"), "view"),
        FunnelEvent(2L, ts("2024-01-01 10:00:00"), "click")) // u2 never enters
      q.processAllAvailable()
      input.addData(
        FunnelEvent(1L, ts("2024-01-01 10:05:00"), "click"),
        FunnelEvent(1L, ts("2024-01-01 10:06:00"), "buy"),
        FunnelEvent(2L, ts("2024-01-01 10:10:00"), "view"))
      q.processAllAvailable()
      val rows = spark.table("funnel_out").as[FunnelOut].collect()
      val byStep = rows.groupBy(_.step_idx).view.mapValues(_.map(_.user_id).toSet).toMap
      assert(byStep === Map(
        0L -> Set(1L, 2L), 1L -> Set(1L), 2L -> Set(1L)))
    } finally q.stop()
  }

  test("chaos replay: simhash dedup under out-of-order arrivals and beyond-watermark lateness") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val deduped = StreamingDaily.streamingSimhashDedup(df, "ts", "text",
      watermark = "1 day")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("simdedup_chaos").start()
    def emitted: Seq[Long] =
      spark.sql("SELECT doc_id FROM simdedup_chaos ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
    try {
      // batch 1: two distinct signatures
      input.addData(
        (ts("2024-01-01 08:00:00"), 1L, "alpha beta"),
        (ts("2024-01-01 09:00:00"), 2L, "gamma delta"))
      q.processAllAvailable()
      assert(emitted === Seq(1L, 2L))
      // batch 2: LATE out-of-order duplicate of sig A — event time EARLIER
      // than the already-emitted copy but inside the watermark horizon ->
      // dropped, no emission
      input.addData((ts("2024-01-01 07:00:00"), 3L, "alpha beta"))
      q.processAllAvailable()
      assert(emitted === Seq(1L, 2L))
      // batch 3: fresh signature 9 days later advances the watermark to
      // Jan 9 08:00 and evicts every Jan-1 state entry
      input.addData((ts("2024-01-10 08:00:00"), 4L, "epsilon zeta"))
      q.processAllAvailable()
      assert(emitted === Seq(1L, 2L, 4L))
      // batch 4: sig A re-arrives AFTER its state's horizon passed ->
      // re-emits (the documented horizon-bounded contract); a late
      // within-watermark duplicate of sig C is still dropped
      input.addData(
        (ts("2024-01-09 23:00:00"), 5L, "alpha beta"),
        (ts("2024-01-10 07:00:00"), 6L, "epsilon zeta"))
      q.processAllAvailable()
      assert(emitted === Seq(1L, 2L, 4L, 5L))
      // batch-equivalence on the surviving set: a batch dedup over the
      // same rows keyed (signature, 1-day event-time session) keeps
      // {A: Jan1 group + Jan9 group, B: 1, C: 1} = 4 survivors — the
      // streaming surviving set has exactly that per-signature shape
      // (which arrival represents a group differs: batch keeps the
      // event-time min, the stream keeps the first ARRIVAL).
      assert(emitted.size === 4)
    } finally q.stop()
  }

  test("chaos replay: streaming funnel vs batch replay under disorder and lateness") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingDaily.{FunnelEvent, FunnelOut}
    val steps = Seq("view", "click", "buy")
    val input = MemoryStream[FunnelEvent]
    val out = StreamingDaily.streamingFunnel(input.toDS(), steps)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_chaos").start()
    try {
      // u1: disorder WITHIN each batch (sorted by event time before
      // folding) + a stale re-delivered view in batch 2
      input.addData(
        FunnelEvent(1L, ts("2024-01-01 10:05:00"), "click"),
        FunnelEvent(1L, ts("2024-01-01 10:00:00"), "view"),
        // u2: steps arrive across batches in fully REVERSED order
        FunnelEvent(2L, ts("2024-01-01 10:20:00"), "buy"))
      q.processAllAvailable()
      input.addData(
        FunnelEvent(1L, ts("2024-01-01 10:01:00"), "view"), // late re-delivery
        FunnelEvent(1L, ts("2024-01-01 10:06:00"), "buy"),
        FunnelEvent(2L, ts("2024-01-01 10:10:00"), "click"))
      q.processAllAvailable()
      input.addData(FunnelEvent(2L, ts("2024-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      val rows = spark.table("funnel_chaos").as[FunnelOut].collect()
      val got = rows.groupBy(_.user_id).view
        .mapValues(_.map(_.step_idx).toSet).toMap
      // the batch oracle: the SAME pure state machine replayed over each
      // user's full event set in one sorted pass
      def batchReplay(uid: Long, evs: Seq[FunnelEvent]): Set[Long] =
        StreamingDaily.funnelStep(uid, evs, None, steps, None)
          ._2.map(_.step_idx).toSet
      val u1Batch = batchReplay(1L, Seq(
        FunnelEvent(1L, ts("2024-01-01 10:05:00"), "click"),
        FunnelEvent(1L, ts("2024-01-01 10:00:00"), "view"),
        FunnelEvent(1L, ts("2024-01-01 10:01:00"), "view"),
        FunnelEvent(1L, ts("2024-01-01 10:06:00"), "buy")))
      // u1's disorder was batch-local -> streaming == batch replay exactly
      assert(got(1L) === u1Batch)
      assert(got(1L) === Set(0L, 1L, 2L))
      // u2's cross-batch reversal exceeds the funnel's reordering
      // tolerance: the stream can only enter at the (late) view — the
      // surviving emissions are a monotone PREFIX of the batch replay,
      // never phantom steps
      val u2Batch = batchReplay(2L, Seq(
        FunnelEvent(2L, ts("2024-01-01 10:20:00"), "buy"),
        FunnelEvent(2L, ts("2024-01-01 10:10:00"), "click"),
        FunnelEvent(2L, ts("2024-01-01 10:00:00"), "view")))
      assert(u2Batch === Set(0L, 1L, 2L))
      assert(got(2L) === Set(0L))
      assert(got(2L).subsetOf(u2Batch))
    } finally q.stop()
  }

  test("multimodal REAL decode: decodeHeaders null-pads unparseable payloads") {
    import graft.multimodal.Multimodal
    val media = Seq(
      (1L, Multimodal.encodeTestImage(1L, "png", 8, 3)),
      (2L, "junk".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    val rows = Multimodal.decodeHeaders(media, "payload")
      .orderBy("media_id").collect()
    assert(rows(0).getAs[String]("format") === "png")
    assert(rows(0).getAs[Int]("width") === 8)
    assert(rows(0).getAs[Int]("height") === 3)
    assert(rows(0).getAs[Int]("channels") === 3)
    assert(rows(1).isNullAt(rows(1).fieldIndex("format")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("width")))
  }
}
