package graft

import org.apache.spark.sql.functions._
import graft.functions.CutSpans

/** [[CutSpans]] — the fused span-cut-and-reassemble kernel behind
  * `Dedup.cutReassemble` — pinned value-identical to the naive
  * position-set reference (the semantics of the round-12 explode +
  * anti-join + array_sort tail): randomized token arrays including
  * EMPTY tokens (the split grid keeps leading/trailing empties),
  * unsorted/overlapping/touching/out-of-range spans, all-cut and
  * no-cut documents. */
class CutSpansKernelSpec extends SparkTestBase {
  import spark.implicits._

  test("CutSpans equals the naive position-set reference") {
    val rnd = new scala.util.Random(19)
    val cases = (0 until 300).map { cid =>
      val n = rnd.nextInt(12)
      val toks = (0 until n).map(i =>
        if (rnd.nextInt(5) == 0) "" else s"t${rnd.nextInt(4)}")
      val m = rnd.nextInt(4)
      // deliberately UNSORTED and possibly overlapping/out-of-range
      val spans = (0 until m).map { _ =>
        val s = rnd.nextInt(n + 2); (s, s + 1 + rnd.nextInt(4))
      }
      (cid.toLong, toks, spans)
    }
    val df = cases.toDF("cid", "tk", "sp")
      .withColumn("out", CutSpans(col("tk"), col("sp")))
      .select(col("cid"), col("out.n_tokens"), col("out.n_kept"),
        col("out.dedup_text"))
    val got = df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    cases.foreach { case (cid, toks, spans) =>
      val cut = spans.flatMap { case (s, e) => s until e }.toSet
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !cut.contains(i) => t
      }
      val want = (toks.size.toLong, kept.size.toLong, kept.mkString(" "))
      assert(got(cid) === want, s"case $cid: toks=$toks spans=$spans")
    }
    // the kernel is codegen, not an interpreted fallback — the t10 gate
    val plan = df.queryExecution.executedPlan
    assert(graft.tools.PlanAudit.fallbackClasses(plan)
        .forall(_ != "CutSpans"),
      "CutSpans fell back to interpreted eval")
  }

  test("CutSpans null propagation and empty inputs") {
    val df = Seq(
      (1L, Some(Seq("a", "b")), Some(Seq((0, 2)))),   // all cut
      (2L, Some(Seq.empty[String]), Some(Seq.empty[(Int, Int)])),
      (3L, None, Some(Seq((0, 1)))),                   // null tokens
      (4L, Some(Seq("a")), None))                      // null spans
      .toDF("cid", "tk", "sp")
      .withColumn("out", CutSpans(col("tk"), col("sp")))
      .select(col("cid"), col("out"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(df(3L) && df(4L), "null input must yield a null struct")
    assert(!df(1L) && !df(2L))
  }
}
