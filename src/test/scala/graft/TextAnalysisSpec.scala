package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** TF-IDF salient terms and deterministic stratified sampling. */
class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens() kernel equals split(lower(text), \\s+) incl. null/empty") {
    val docs = Seq(
      Some("The CAT  sat\t on a MAT "), Some(""), Some("   "),
      Some(" lead and trail "), Some("héllo WÖRLD 中文"), None)
      .zipWithIndex.map { case (t, i) => (i.toLong, t.orNull) }
      .toDF("doc_id", "text")
    val both = docs.select(
      TextAnalysis.tokens(col("text")).as("fused"),
      split(lower(col("text")), "\\s+").as("ref"))
    both.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null drift: $r")
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"token drift: $r")
    }
  }

  test("tfIdfTopK: corpus-unique terms outrank ubiquitous ones") {
    val docs = Seq(
      (1L, "the cat sat on a mat"),
      (2L, "the dog sat on a log"),
      (3L, "the bird flew over a rainbow")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", 2)
    // every term here has tf=1, so ranking is pure idf: the winner in
    // each doc must be a corpus-unique term (df=1), never "the"/"a"
    // (df=3) or "sat"/"on" (df=2).
    val winners = top.filter(col("rk") === 1).select("df").as[Long].collect()
    assert(winners.forall(_ == 1L), s"non-unique term won: ${winners.mkString(",")}")
    // every doc gets exactly k rows when it has >= k distinct terms
    assert(top.groupBy("doc_id").count().select("count").as[Long].collect()
      .forall(_ == 2L))
    // df is corpus-wide: "sat" is in docs 1 and 2
    val dfSat = top.filter(col("term") === "sat").select("df").as[Long].collect()
    assert(dfSat.forall(_ == 2L))
  }

  test("tfIdfTopK is deterministic across reruns") {
    val docs = (1L to 50L).map(i =>
      (i, s"alpha beta w$i w${i % 7} gamma")).toDF("doc_id", "text")
    val a = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", 3)
      .orderBy("doc_id", "rk").collect().toSeq
    val b = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", 3)
      .orderBy("doc_id", "rk").collect().toSeq
    assert(a === b)
  }

  test("unigramLogProb: in-distribution text scores higher than rare-token text") {
    val docs = Seq(
      (1L, "the cat and the dog and the cat"),  // common tokens
      (2L, "zxqv wplk mnbt"),                   // singleton garbage
      (3L, "")).toDF("doc_id", "text")          // token-less
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(1L)._1 === 8L && got(2L)._1 === 3L)
    assert(got(1L)._2.get > got(2L)._2.get,
      s"common text ${got(1L)._2} should outscore garbage ${got(2L)._2}")
    assert(got(3L) === ((0L, None)))
    // hand-check one token: p(the) = (3+1)/(11+7) over 11 tokens, 7 vocab
    val pThe = math.log(4.0 / 18.0)
    assert(got(1L)._2.get < 0 && pThe < 0)
  }

  test("contaminationScan: overlap counts, ratio, and zero for clean/short docs") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox sleeps"),    // shares 2 of its 3 trigrams
      (2L, "completely clean document text today"), // 0 overlap
      (3L, "too short")).toDF("doc_id", "text")     // no trigrams at all
    val got = graft.operators.Dedup
      .contaminationScan(corpus, "doc_id", "text", bench, "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: trigrams {the quick brown, quick brown fox, brown fox sleeps};
    // bench has the first two -> 2/3
    assert(got(1L)._1 === 3L && got(1L)._2 === 2L)
    assert(math.abs(got(1L)._3 - 0.666667) < 1e-6)
    assert(got(2L) === ((3L, 0L, 0.0)))
    assert(got(3L) === ((0L, 0L, 0.0)))
  }

  test("packIntoShards: budget respected at boundaries, deterministic, per-stratum") {
    val docs = (1L to 20L).map(i => (i, "en", ("w " * 10).trim)) ++
      (21L to 25L).map(i => (i, "fr", ("w " * 10).trim))
    val df = docs.toDF("doc_id", "lang", "text")
    val packed = TextAnalysis.packIntoShards(df, "doc_id", "text", "lang", 25L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    // every doc is 10 tokens; budget 25 -> offsets 0,10,20,30,... ->
    // shards 0,0,0,1,1,2,2,2,3,... (offset/25): sizes follow the greedy rule
    val en = packed.filter(_._2 == "en")
    assert(en.map(_._4).distinct.sorted.toSeq === (0L to 7L), // 20 docs * 10 tok / 25
      s"en shards: ${en.map(_._4).distinct.sorted.mkString(",")}")
    // fr packs independently from shard 0
    assert(packed.filter(_._2 == "fr").map(_._4).min === 0L)
    // deterministic across reruns
    val again = TextAnalysis.packIntoShards(df, "doc_id", "text", "lang", 25L)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(packed.map(p => p._1 -> p._4).toMap === again)
    // per-shard token sums never exceed budget + one doc (greedy bound)
    val perShard = en.groupBy(_._4).values.map(_.map(_._3).sum)
    assert(perShard.forall(s => s <= 25L + 10L))
  }

  test("stratifiedSample: exact ceil quota per stratum, deterministic membership") {
    val docs = ((1L to 40L).map((_, "en")) ++ (41L to 50L).map((_, "fr")))
      .toDF("doc_id", "lang")
    val s1 = TextAnalysis.stratifiedSample(docs, "doc_id", "lang", 0.25)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("en" -> 10L, "fr" -> 3L)) // ceil(0.25*40), ceil(0.25*10)
    // same rows on rerun (SHA order, no RNG)
    val ids1 = s1.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = TextAnalysis.stratifiedSample(docs, "doc_id", "lang", 0.25)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 === ids2)
    // schema passes through untouched
    assert(s1.columns.toSeq === Seq("doc_id", "lang"))
  }

  test("normalizeForDedup: case/punctuation/whitespace variants collapse") {
    val docs = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "HELLO ... world\t"),
      (4L, "goodbye world"))
      .toDF("doc_id", "text")
    val dups = graft.operators.Dedup.exactDups(
      docs.withColumn("norm_text",
        TextAnalysis.normalizeForDedup(col("text"))),
      "doc_id", "norm_text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(dups === Map(1L -> 3L, 4L -> 1L)) // 1/2/3 collapse; 4 alone
    // Unicode-aware: distinct non-Latin docs must NOT collapse to "",
    // and accented letters survive instead of being stripped
    val uni = Seq((1L, "日本語のテキスト"), (2L, "中文文本"), (3L, "café!"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.normalizeForDedup(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(uni(1L) !== uni(2L))
    assert(uni(1L).nonEmpty && uni(2L).nonEmpty)
    assert(uni(3L) === "café")
  }

  test("chunkDocuments: offsets, overlap, short tail, empty/short-doc edges") {
    val docs = Seq(
      (1L, (1 to 25).map(i => s"w$i").mkString(" ")), // 25 tokens
      (2L, "a b c"),                                  // shorter than one chunk
      (3L, ""),                                       // no chunks at all
      (4L, (1 to 8).map(i => s"w$i").mkString(" ")),  // < chunk but > stride
      (5L, (1 to 22).map(i => s"w$i").mkString(" "))) // start 21 would be a subset
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 10, overlapTokens = 3)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // stride 7: starts 0,7,14,21 — last chunk holds the 4-token tail
    assert(d1.toSeq === Seq((0L, 0L, 10L), (1L, 7L, 10L), (2L, 14L, 10L),
      (3L, 21L, 4L)))
    // consecutive chunks share `overlap` tokens: same text joined, so the
    // shas of full chunks differ while the doc-2 single short chunk stands
    assert(out.filter(_.getLong(0) == 2L).map(r =>
      (r.getLong(1), r.getLong(3))).toSeq === Seq((0L, 3L)))
    assert(!out.exists(_.getLong(0) == 3L))
    // no degenerate trailing chunks that are strict subsets of their
    // predecessor: 8 tokens fit one chunk (no 1-token tail at start 7);
    // 22 tokens end at start 14 (a start-21 chunk would add no new token)
    assert(out.filter(_.getLong(0) == 4L).map(r =>
      (r.getLong(1), r.getLong(3))).toSeq === Seq((0L, 8L)))
    assert(out.filter(_.getLong(0) == 5L).map(r =>
      (r.getLong(1), r.getLong(3))).toSeq ===
      Seq((0L, 10L), (1L, 10L), (2L, 8L)))
    // deterministic: the chunk sha is stable across reruns
    val again = TextAnalysis.chunkDocuments(docs, "doc_id", "text", 10, 3)
      .orderBy("doc_id", "chunk_id").collect().map(_.getString(4)).toSeq
    assert(again === out.map(_.getString(4)).toSeq)
  }

  test("chunkDedup: repeated spans keep only the globally-first occurrence") {
    val docs = Seq(
      (1L, "x1 x2 x3 a b c x4 x5 x6"), // chunks: [x1 x2 x3][a b c][x4 x5 x6]
      (2L, "a b c y1 y2 y3"),          // [a b c] repeats doc1's chunk 1
      (3L, "z1 z2"),                   // single short chunk, unique
      (4L, ""),                        // no chunks at all
      (5L, "p q r p q r"))             // within-doc repeat: 2nd chunk dropped
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.chunkDedup(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out(0) === ((1L, 3L, 3L, 9L, "x1 x2 x3 a b c x4 x5 x6")))
    // doc 2 loses the copied span but keeps its own tail, order preserved
    assert(out(1) === ((2L, 2L, 1L, 3L, "y1 y2 y3")))
    assert(out(2) === ((3L, 1L, 1L, 2L, "z1 z2")))
    assert(out(3) === ((4L, 0L, 0L, 0L, "")))
    assert(out(4) === ((5L, 2L, 1L, 3L, "p q r")))
  }

  test("dd19 property: global first-occurrence rule == literal Scala reference (randomized)") {
    val rnd = new scala.util.Random(19)
    val vocab = Vector("a", "b", "c", "d", "e")
    val k = 3
    val docs = (0L until 40L).map { id =>
      val n = rnd.nextInt(30)
      (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // literal reference: non-overlapping k-token chunks (== grouped(k)
    // for overlap 0), an occurrence survives iff it is the global
    // (doc_id, chunk_id)-min for its content
    def chunksOf(text: String): Seq[Seq[String]] = {
      val tk = text.split("\\s+").filter(_.nonEmpty).toSeq
      if (tk.isEmpty) Seq.empty else tk.grouped(k).toSeq
    }
    val firstOcc = docs
      .flatMap { case (id, t) => chunksOf(t).zipWithIndex.map {
        case (ch, ci) => (ch, (id, ci.toLong)) } }
      .groupBy(_._1).map { case (ch, os) => ch -> os.map(_._2).min }
    val expected = docs.map { case (id, t) =>
      val chs = chunksOf(t).zipWithIndex
      val kept = chs.filter { case (ch, ci) => firstOcc(ch) == ((id, ci.toLong)) }
      (id, chs.size.toLong, kept.size.toLong,
        kept.map(_._1.size.toLong).sum,
        kept.map(_._1.mkString(" ")).mkString(" "))
    }
    val got = graft.operators.Dedup.chunkDedup(
        docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got === expected)
  }

  test("bpeTokenCounts: priority-ordered merges produce the hand-derived subwords") {
    // value: v a l u e -(u e)-> v a l ue -(v a)-> va l ue -(va l)-> val ue = 2
    // table: t a b l e -(l e)-> t a b le -(b le)-> t a ble             = 3
    // query: q u e r y -(e r, before u e in priority)-> q u er y       = 4
    val docs = Seq((1L, "value table query"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTokenCounts(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 3L)
    assert(out(0).getLong(2) === 9L)
    assert(out(0).getLong(3) === 15L)
    assert(math.abs(out(0).getDouble(4) - 15.0 / 9.0) < 1e-6)
    // empty doc: zero counts, null ratio
    assert(out(1).getLong(1) === 0L && out(1).getLong(2) === 0L &&
      out(1).isNullAt(4))
  }

  test("dsirWeights: target-like docs outscore off-target docs") {
    val docs = Seq(
      (1L, "aa bb aa bb aa"),  // target-vocabulary doc
      (2L, "aa bb aa bb"),
      (3L, "zz ww zz ww zz"),  // off-target vocabulary
      (4L, ""))                // no features at all
      .toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") <= 2)
    val out = TextAnalysis.dsirWeights(target, docs, "doc_id", "text", 4096)
      .orderBy("doc_id").collect()
    // unigrams + bigrams: doc 1 has 5 + 4 = 9 features
    assert(out(0).getLong(1) === 9L)
    val w = out.map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    // target-vocab docs carry positive log importance, off-target negative
    assert(w(0).get > w(2).get)
    assert(w(0).get > 0.0 && w(2).get < 0.0)
    // empty doc: zero features, null weight (not a fabricated 0)
    assert(out(3).getLong(1) === 0L && w(3).isEmpty)
    // the fused one-pass predicate form is value-identical to the
    // general two-corpus form
    val byPred = TextAnalysis.dsirWeightsByPred(docs, col("doc_id") <= 2,
        "doc_id", "text", 4096)
      .orderBy("doc_id").collect()
    assert(byPred.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("chunkDocuments invariants: full token coverage, exact overlap, no subset chunks") {
    val rnd = new scala.util.Random(11)
    val cases = (0 until 20).map { i =>
      val n = rnd.nextInt(120) // 0..119 tokens
      (i.toLong, (1 to n).map(j => s"t$j").mkString(" "))
    }
    val docs = cases.toDF("doc_id", "text")
    val chunk = 16
    val overlap = 5
    val out = TextAnalysis.chunkDocuments(docs, "doc_id", "text", chunk, overlap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val nTokens = cases.map { case (id, t) =>
      id -> t.split("\\s+").count(_.nonEmpty) }.toMap
    nTokens.foreach { case (id, n) =>
      val chunks = out.getOrElse(id, Array.empty).sortBy(_._2)
      if (n == 0) assert(chunks.isEmpty)
      else {
        // chunk ids are contiguous from 0 and starts follow the stride
        assert(chunks.map(_._2).toSeq === chunks.indices.map(_.toLong))
        chunks.foreach { case (_, cid, start, len) =>
          assert(start === cid * (chunk - overlap))
          assert(len === math.min(chunk.toLong, n - start))
        }
        // full coverage: the last chunk reaches the final token
        val (_, _, lastStart, lastLen) = chunks.last
        assert(lastStart + lastLen === n.toLong)
        // no chunk is a subset of its predecessor
        chunks.sliding(2).foreach {
          case Array((_, _, s0, l0), (_, _, s1, l1)) =>
            assert(s1 + l1 > s0 + l0, s"doc $id: subset chunk at start $s1")
          case _ =>
        }
      }
    }
  }

  test("mixtureSample: per-group token budgets honored, weight-0 group dropped") {
    // 30 docs x 10 tokens = 300 total; frac 0.5 -> 150 sampled tokens:
    // en budget floor(150*0.6)=90 -> 9 docs admitted (10th prefix = 90,
    // not < 90), fr budget floor(150*0.4)=60 -> 6 docs, de weight absent
    // -> budget 0 -> dropped entirely
    val docs = ((1L to 15L).map((_, "en")) ++ (16L to 25L).map((_, "fr")) ++
      (26L to 30L).map((_, "de")))
      .map { case (i, l) => (i, l, ("w " * 10).trim) }
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.mixtureSample(docs, "doc_id", "text", "lang",
      Map("en" -> 0.6, "fr" -> 0.4), 0.5)
    val byLang = out.collect()
      .groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length }
    assert(byLang === Map("en" -> 9, "fr" -> 6))
    assert(out.select("budget_tokens").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(60L, 90L))
    // deterministic membership across reruns (SHA order, no RNG)
    val ids1 = out.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = TextAnalysis.mixtureSample(docs, "doc_id", "text", "lang",
      Map("en" -> 0.6, "fr" -> 0.4), 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 === ids2)
  }

  test("repetitionMetrics: hand-computed fractions, empty/one-token guards") {
    val docs = Seq(
      (1L, "a b a b a b"),       // 6 tokens, 2 distinct; top bigram "a b" x3 of 5
      (2L, "u v w x y"),         // all distinct, every bigram unique
      (3L, "solo"),              // one token: no bigrams
      (4L, ""),                  // zero tokens
      (5L, "z z z z"),           // fully degenerate
      (6L, null: String)         // null text PINNED as an empty doc
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_tokens", "n_distinct", "dup_token_frac", "top_bigram_frac")
      .as[(Long, Long, Double, Double)].collect().toSeq
    def approx(a: Double, b: Double) = math.abs(a - b) < 1e-6
    assert(m(0)._1 == 6L && m(0)._2 == 2L)
    assert(approx(m(0)._3, 1 - 2.0 / 6) && approx(m(0)._4, 3.0 / 5))
    assert(m(1)._3 == 0.0 && m(1)._4 == 0.25) // 5 tokens, 4 bigrams, top=1
    assert(m(2) == ((1L, 1L, 0.0, 0.0)))
    assert(m(3) == ((0L, 0L, 0.0, 0.0)))
    assert(m(4)._3 == 0.75 && m(4)._4 == 1.0)
    // null text = empty doc (0 tokens, ratios 0.0) — the fused-kernel
    // convention, pinned here because the pre-kernel composable chain
    // propagated null for n_tokens/n_distinct instead.
    assert(m(5) == ((0L, 0L, 0.0, 0.0)))
  }

  test("ngramRepetition: hand-computed top/dup coverage, short-doc zeros") {
    val docs = Seq(
      (1L, "a b a b a b"),  // 3-grams: aba,bab,aba,bab -> top 2/4, dup 4/4
      (2L, "p q r s t"),    // all distinct: top3 1/3, dup3 0; one 5-gram
      (3L, "x y")           // too short for both n: zeros
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramRepetition(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Long, Double, Double)].collect().toSeq
    assert(out(0) === ((1L, 4L, 0.5, 1.0, 2L, 0.5, 0.0)))
    assert(out(1) === ((2L, 3L, 0.333333, 0.0, 1L, 1.0, 0.0)))
    assert(out(2) === ((3L, 0L, 0.0, 0.0, 0L, 0.0, 0.0)))
  }

  test("unigramCrossScore: hand-computed cross-fit probs, OOV floor, edge cases") {
    // reference: 3 tokens total ("a a b"), vocab 2 -> denom = 5
    val ref = Seq((100L, "a a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),     // in-vocab: ln(3/5), ln(2/5)
      (2L, "zzz"),     // OOV: smoothed floor ln(1/5)
      (3L, "")         // token-less: n_tokens 0, null scores
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramCrossScore(ref, docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val exp1 = r6((math.log(3.0 / 5) + math.log(2.0 / 5)) / 2)
    assert(out(0) === ((1L, 2L, Some(exp1), Some(r6(math.exp(-exp1))))))
    val exp2 = r6(math.log(1.0 / 5))
    assert(out(1) === ((2L, 1L, Some(exp2), Some(r6(math.exp(-exp2))))))
    assert(out(2) === ((3L, 0L, None, None)))
    // empty reference: every token takes the defined floor ln(1/1) = 0
    val out0 = TextAnalysis.unigramCrossScore(
      ref.filter(col("doc_id") < 0), docs.filter(col("doc_id") === 1L),
      "doc_id", "text").as[(Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(out0 === Seq((1L, 2L, Some(0.0), Some(1.0))))
  }

  test("gopherRules: each published rule trips on its crafted violator, clean doc keeps") {
    val stop8 = "the be to of and that have with"
    val filler = Seq.fill(13)("alpha beta gamma delta").mkString(" ")
    val docs = Seq(
      (1L, s"$stop8 $filler"),                            // 60 words, clean -> keep
      (2L, s"$stop8 tiny"),                               // 9 words -> r1 fails
      (3L, s"$stop8 " + Seq.fill(52)("##x").mkString(" ")), // hash ratio 104/60 -> r3
      (4L, s"$stop8\n" + Seq.fill(10)("- bullet line here").mkString("\n")), // 10/11 bullet lines -> r4
      (5L, s"$stop8 $filler" + Seq.fill(5)("\ntrailing line ...").mkString), // 5/6 ellipsis-ended -> r5
      (6L, (1 to 60).map(_.toString).mkString(" ")),      // all-numeric words -> r6, r7
      (7L, filler + " " + filler)                         // 104 words, 0 stopwords -> r7
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("keep", "r1_word_count", "r2_mean_word_len", "r3_symbol_ratio",
        "r4_bullet_lines", "r5_ellipsis_lines", "r6_alpha_words", "r7_stop_words")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toSeq
    assert(out(0) == ((true, true, true, true, true, true, true, true)))
    assert(!out(1)._2 && !out(1)._1, "short doc must fail r1")
    assert(!out(2)._4, "hash-heavy doc must fail r3")
    assert(!out(3)._5, "bullet-dominated doc must fail r4")
    assert(!out(4)._6, "ellipsis-ended lines must fail r5")
    assert(!out(5)._7 && !out(5)._8, "numeric doc must fail r6 and r7")
    assert(!out(6)._8 && out(6)._2, "stopword-free doc must fail only r7-ish")

    // the map-only filter form must make the SAME boundary decisions as
    // the audit flags restricted to the six structural rules (r1-r6),
    // and must preserve every input column
    val filtered = TextAnalysis.gopherStructuralFilter(docs, "text")
    assert(filtered.columns.toSeq == docs.columns.toSeq,
      "filter form must preserve the input schema")
    val wantIds = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .filter(col("r1_word_count") && col("r2_mean_word_len") &&
        col("r3_symbol_ratio") && col("r4_bullet_lines") &&
        col("r5_ellipsis_lines") && col("r6_alpha_words"))
      .select("doc_id").as[Long].collect().toSet
    assert(filtered.select("doc_id").as[Long].collect().toSet == wantIds,
      "gopherStructuralFilter must equal the r1-r6 flag conjunction")
  }

  test("c4Rules: each published page rule trips on its crafted violator, clean doc keeps") {
    val goodLine = "This line has at least five words."
    val docs = Seq(
      (1L, Seq.fill(4)(goodLine).mkString("\n")),          // 4 sentences, 4 kept lines -> keep
      (2L, s"$goodLine\nSecond sentence here is fine."),   // 2 sentences -> r1 fails
      (3L, Seq.fill(3)(goodLine).mkString("\n") + "\nSome lorem ipsum filler text here."), // r2
      (4L, Seq.fill(3)(goodLine).mkString("\n") + "\nvar x = { a: 1 }. Yes."), // r3
      (5L, "no terminal punctuation on this line\n" +
        "short line.\n" +                                  // < 5 words
        "This javascript line would have been kept otherwise.\n" +
        "One. Two. Three. Four")                           // 4 sentences but 0 kept lines -> r4
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Rules(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("keep", "r1_min_sentences", "r2_no_lorem_ipsum",
        "r3_no_curly_brace", "r4_has_kept_lines", "n_lines", "n_lines_kept")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Long, Long)]
      .collect().toSeq
    assert(out(0) == ((true, true, true, true, true, 4L, 4L)))
    assert(!out(1)._2 && !out(1)._1, "two-sentence page must fail r1")
    assert(!out(2)._3 && out(2)._2, "lorem-ipsum page must fail exactly r2")
    assert(!out(3)._4, "curly-brace page must fail r3")
    assert(!out(4)._5 && out(4)._2 && out(4)._6 == 4L && out(4)._7 == 0L,
      "a page whose every line fails the line filter must fail r4")
    // the line filter's three clauses each kill exactly one line of doc 5:
    // no terminal punct, < 5 words, javascript mention, unterminated tail
    val frac = TextAnalysis.c4Rules(docs, "doc_id", "text")
      .filter(col("doc_id") === 1L).select("frac_lines_kept")
      .as[Double].head()
    assert(frac == 1.0)
  }

  test("c4StructuralClean: gate == c4Rules keep flag, rewrite keeps exactly the kept lines") {
    val goodLine = "This line has at least five words."
    val docs = Seq(
      (1L, Seq.fill(4)(goodLine).mkString("\n"), "a"),
      (2L, s"$goodLine\nSecond sentence here is fine.", "a"),  // r1 fails
      (3L, Seq.fill(3)(goodLine).mkString("\n") + "\nSome lorem ipsum filler text here.", "b"),
      (4L, Seq.fill(3)(goodLine).mkString("\n") + "\nvar x = { a: 1 }. Yes.", "b"),
      (5L, "no terminal punctuation on this line\nshort line.\n" +
        "This javascript line would have been kept otherwise.\n" +
        "One. Two. Three. Four", "c"),
      // survivor with a genuine line-level rewrite: 3 good sentences +
      // one line the filter drops (4 words)
      (6L, Seq.fill(3)(goodLine).mkString("\n") + "\nOnly four words here.", "c")
    ).toDF("doc_id", "text", "source")
    val cleaned = TextAnalysis.c4StructuralClean(docs, "text")
    // input schema preserved, plus clean_text
    assert(cleaned.columns.toSeq == docs.columns.toSeq :+ "clean_text")
    // the gate keeps exactly c4Rules' keep = true pages
    val wantIds = TextAnalysis.c4Rules(docs, "doc_id", "text")
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    val gotIds = cleaned.select("doc_id").as[Long].collect().toSet
    assert(gotIds == wantIds && gotIds == Set(1L, 6L),
      s"gate must equal the audit keep flag; got $gotIds")
    // the rewrite keeps exactly the lines the audit's n_lines_kept counts
    val byId = cleaned.select("doc_id", "clean_text")
      .as[(Long, String)].collect().toMap
    assert(byId(1L) == Seq.fill(4)(goodLine).mkString("\n"),
      "all-kept page must round-trip unchanged")
    assert(byId(6L) == Seq.fill(3)(goodLine).mkString("\n"),
      "the failing 4-word line must be cut, survivors joined in order")
  }

  test("topKPerQuery (via bruteForceTopK): salted two-stage rank == literal Scala top-k, ties included") {
    import graft.operators.Similarity
    // 400 vectors with only 3 distinct directions -> massive rounded-sim
    // ties, so the salted partial rank and the final rank MUST agree on
    // the (sim desc, neighbor_id asc) ordering or rows leak/shift.
    val vecs = (0L until 400L).map { i =>
      val d = (i % 3).toInt
      val base = Array.tabulate(8)(j => if (j % 3 == d) 1.0f else 0.1f)
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") < 7)
    val out = Similarity.bruteForceTopK(qs, vecs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "sim", "rk")
      .as[(Long, Long, Double, Long)].collect().toSeq.sortBy(r => (r._1, r._4))
    // literal reference: cosine of the same rows, rounded like the engine
    val arr = vecs.as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val expected = (0L until 7L).flatMap { q =>
      arr.keys.filter(_ != q).toSeq
        .map(n => (q, n, cos(arr(q), arr(n))))
        .sortBy { case (_, n, s) => (-s, n) }.take(5).zipWithIndex
        .map { case ((qq, n, s), i) => (qq, n, s, i + 1L) }
    }
    assert(out == expected, s"two-stage top-k diverged from literal rank")
  }

  test("piiColumns: detects and redacts emails, phones, IPv4; clean text untouched") {
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or 555-123-4567 now"),
      (2L, "server at 192.168.1.250 and 10.0.0.1 responded"),
      (3L, "no pii here, just words and numbers like 42"),
      (4L, "a@b.io mails a@b.io twice; phone 111 222 3333")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiColumns(docs, "text").orderBy("doc_id")
      .select("n_emails", "n_phones", "n_ipv4", "pii_total", "redacted_text")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out(0)._1 == 1L && out(0)._2 == 1L && out(0)._3 == 0L && out(0)._4 == 2L)
    assert(out(0)._5 == "contact <PII> or <PII> now")
    assert(out(1)._3 == 2L && out(1)._5 == "server at <PII> and <PII> responded")
    assert(out(2)._4 == 0L && out(2)._5 == "no pii here, just words and numbers like 42")
    assert(out(3)._1 == 2L && out(3)._2 == 1L)
    assert(out(3)._5 == "<PII> mails <PII> twice; phone <PII>")
  }

  test("piiRedactCut: token spans cut with one sentinel per maximal span") {
    val docs = Seq(
      // two separated spans -> two sentinels
      (1L, "mail bob@example.org or call 555-123-4567 today"),
      // two ADJACENT PII tokens -> ONE merged span, one sentinel
      (2L, "nodes 10.0.0.1 10.0.0.2 up"),
      (3L, "clean text only"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = operators.Dedup.piiRedactCut(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_tokens", "n_pii_tokens", "n_pii_spans", "redacted_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out(0) == ((6L, 2L, 2L, "mail <PII> or call <PII> today")))
    assert(out(1) == ((4L, 2L, 1L, "nodes <PII> up")))
    assert(out(2) == ((3L, 0L, 0L, "clean text only")))
    assert(out(3)._2 == 0L)
  }

  test("urlColumns: scheme/query/fragment/www/port/trailing-slash canonicalization") {
    val urls = Seq(
      (1L, "HTTPS://WWW.Big.Example.COM:443/p/3/?utm=x#frag"),
      (2L, "http://big.example.com/p/3"),
      (3L, "https://site9.example.org"),          // no path
      (4L, "www.site9.example.org:80/a//"),        // no scheme, double slash
      (5L, "https://user:Pw@WWW.Big.Example.COM:443/p/3"), // userinfo
      (6L, "ftp://u@site9.example.org:2121/a"),    // userinfo + NON-default port
      (7L, "http://big.example.com/p/3?r=a@b.c"),  // '@' in query, not userinfo
      (8L, "http://a@b@site9.example.org/p")        // '@' INSIDE userinfo: RFC 3986 userinfo ends at the LAST '@'
    ).toDF("doc_id", "url")
    val out = TextAnalysis.urlColumns(urls, "url").orderBy("doc_id")
      .select("url_host", "url_canon").as[(String, String)].collect().toSeq
    assert(out(0) == (("big.example.com", "big.example.com/p/3")))
    assert(out(1) == (("big.example.com", "big.example.com/p/3")))
    assert(out(2) == (("site9.example.org", "site9.example.org")))
    assert(out(3) == (("site9.example.org", "site9.example.org/a")))
    // userinfo is stripped before www/port normalization, so a
    // credentialed recrawl collapses with the clean URL...
    assert(out(4) == (("big.example.com", "big.example.com/p/3")))
    // ...while a non-default port stays: different origin, its own cap
    assert(out(5) == (("site9.example.org:2121", "site9.example.org:2121/a")))
    // '@' after the authority segment (query/path) is NOT userinfo
    assert(out(6) == (("big.example.com", "big.example.com/p/3")))
    // userinfo with an embedded '@' strips to the LAST '@'
    assert(out(7) == (("site9.example.org", "site9.example.org/p")))
  }
}
