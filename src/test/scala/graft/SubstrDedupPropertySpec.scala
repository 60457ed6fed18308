package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Randomized invariants of the stride-1 ExactSubstr family
  * ([[Dedup.duplicatedSpans]] / [[Dedup.substrCut]] /
  * [[Dedup.softDedupWeights]] / [[Dedup.decontamCut]]) over seeded
  * random corpora built from a small vocabulary (so duplicated windows,
  * touching spans and multi-island docs occur by construction):
  *
  *  1. dd24 accounting: 0 <= dup_tokens <= n_tokens; a window W span
  *     covers at least W tokens and at most the whole doc; dup_frac is
  *     exactly dup_tokens / n_tokens;
  *  2. dd26 conservation: the reassembled text has exactly
  *     n_tokens - tokens_cut tokens, and is a SUBSEQUENCE of the
  *     lowercased original tokens (cutting never reorders or invents);
  *  3. dd24/dd26 consistency: tokens_cut <= dup_tokens per doc (dd26
  *     keeps first occurrences that dd24 still counts as duplicated);
  *  4. dd25 bounds: sample_weight in (0, 1]; weight is 1 exactly when
  *     every window is corpus-unique (or the doc has no windows);
  *  5. dd27 degenerate cases: an empty eval corpus cuts nothing; eval ==
  *     train cuts every window-covered token of every train doc.
  */
class SubstrDedupPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val W = 3

  test("randomized corpora: span accounting, cut conservation, weight bounds") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val vocab = (0 until 8 + 4 * trial).map(j => s"w$j")
      def doc(): String =
        (0 until 3 + rnd.nextInt(10)).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      val docs = (0L until 24L).map(i => (i, doc())).toDF("doc_id", "text")

      val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", W)
        .collect().map(r => r.getLong(0) -> r).toMap
      val cut = Dedup.substrCut(docs, "doc_id", "text", W)
        .collect().map(r => r.getLong(0) -> r).toMap
      val weights = Dedup.softDedupWeights(docs, "doc_id", "text", W)
        .collect().map(r => r.getLong(0) -> r).toMap
      val original = docs.collect()
        .map(r => r.getLong(0) -> r.getString(1).toLowerCase
          .split("\\s+").toSeq).toMap

      original.foreach { case (id, toks) =>
        val s = spans(id); val c = cut(id); val w = weights(id)
        val n = toks.size.toLong
        // 1. dd24 accounting
        assert(s.getAs[Long]("n_tokens") === n)
        val dupTokens = s.getAs[Long]("dup_tokens")
        assert(dupTokens >= 0 && dupTokens <= n, s"doc $id dup_tokens")
        val nSpans = s.getAs[Long]("n_spans")
        assert(nSpans == 0 || dupTokens >= W, s"doc $id span floor")
        assert(math.abs(s.getAs[Double]("dup_frac") -
          dupTokens.toDouble / math.max(n, 1)) < 1e-6)
        // 2. dd26 conservation + subsequence
        val kept = c.getAs[String]("dedup_text")
        val keptToks = if (kept.isEmpty) Seq.empty[String]
          else kept.split(" ").toSeq
        assert(keptToks.size.toLong === n - c.getAs[Long]("tokens_cut"),
          s"doc $id token conservation")
        var i = 0
        keptToks.foreach { t =>
          val j = toks.indexOf(t, i)
          assert(j >= 0, s"doc $id: kept token '$t' out of order")
          i = j + 1
        }
        // 3. cut never exceeds detected duplication
        assert(c.getAs[Long]("tokens_cut") <= dupTokens,
          s"doc $id cut ${c.getAs[Long]("tokens_cut")} > dup $dupTokens")
        // 4. dd25 bounds
        val sw = w.getAs[Double]("sample_weight")
        assert(sw > 0 && sw <= 1.0 + 1e-9, s"doc $id weight $sw")
        if (w.getAs[Long]("n_windows") === 0L) assert(sw === 1.0)
      }
    }
  }

  test("decontam degenerate cases: empty eval cuts nothing, eval==train cuts all windows") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "f g h"), (3L, "x y")).toDF("doc_id", "text")
    val emptyEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val none = Dedup.decontamCut(docs, emptyEval, "doc_id", "text", W)
      .collect()
    none.foreach { r =>
      assert(r.getAs[Long]("tokens_cut") === 0)
    }
    val all = Dedup.decontamCut(docs, docs, "doc_id", "text", W)
      .collect().map(r => r.getLong(0) -> r).toMap
    // docs with >= W tokens lose every token (every window is shared);
    // shorter docs have no windows and lose nothing
    assert(all(1L).getAs[Long]("tokens_cut") === 5)
    assert(all(2L).getAs[Long]("tokens_cut") === 3)
    assert(all(3L).getAs[Long]("tokens_cut") === 0)
    assert(all(3L).getAs[String]("dedup_text") === "x y")
  }
}
