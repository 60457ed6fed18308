package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hashing, ShaPrefixLong}

/** Pins the native [[ShaPrefixLong]] to the composable formula it
  * replaced: the DuckDB oracle still computes
  * `('0x' || substr(sha256(s), 1, n))::bigint`, so any divergence here
  * breaks every hash-checked dedup query. */
class HashingSpec extends SparkTestBase {

  private def composed(c: org.apache.spark.sql.Column, n: Int) =
    conv(substring(sha2(c.cast("string"), 256), 1, n), 16, 10).cast("long")

  test("ShaPrefixLong equals conv(substr(sha2)) for 7 and 15 hex chars") {
    import spark.implicits._
    val tricky = Seq("", "a", "hello world", "héllo wörld é中文",
      "0", "-1", "2147483647", "\n\t", "  spaces  ", "a" * 500)
    val rng = new scala.util.Random(42)
    val rand = (1 to 500).map(_ => rng.alphanumeric.take(rng.nextInt(40)).mkString)
    val df = (tricky ++ rand).toDF("s")
    val mism = df.select(
        ShaPrefixLong(col("s"), 7).as("fast7"), composed(col("s"), 7).as("ref7"),
        ShaPrefixLong(col("s"), 15).as("fast15"), composed(col("s"), 15).as("ref15"))
      .filter(col("fast7") =!= col("ref7") || col("fast15") =!= col("ref15"))
    assert(mism.isEmpty)
  }

  test("ShaPrefixLong matches on non-string inputs via the Hashing cast") {
    import spark.implicits._
    val df = Seq(0L, 1L, -7L, 2147483647L, 1234567890123L).toDF("v")
    val mism = df.select(
        Hashing.sha28(col("v")).as("fast"),
        composed(col("v"), 7).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(mism.isEmpty)
    // null propagates
    val n = df.select(Hashing.sha28(lit(null).cast("string")).as("h")).head()
    assert(n.isNullAt(0))
  }

  test("modP (Mersenne fold) equals % over the whole exact domain") {
    val rng = new scala.util.Random(11)
    (1 to 500000).foreach { _ =>
      val x = rng.nextLong() >>> 2 // uniform over [0, 2^62)
      assert(Hashing.modP(x) == x % Hashing.P, s"modP($x)")
    }
    for (x <- Seq(0L, 1L, Hashing.P - 1, Hashing.P, Hashing.P + 1,
        (1L << 31) - 1, 1L << 31, (1L << 31) + 1, (1L << 62) - 1))
      assert(Hashing.modP(x) == x % Hashing.P, s"modP($x) edge")
  }

  test("MinHashOverHashed equals the k-fold transform+array_min form") {
    import spark.implicits._
    import graft.functions.{Hashing => H, MinHashOverHashed}
    val rnd = new scala.util.Random(3)
    val rows: Seq[Seq[java.lang.Long]] =
      (1 to 300).map(_ => Seq.fill(rnd.nextInt(12))(
        java.lang.Long.valueOf(rnd.nextInt(1 << 28).toLong))) ++
      Seq(Seq.empty[java.lang.Long],            // empty -> null minima
        Seq(null.asInstanceOf[java.lang.Long]), // all-null -> null minima
        Seq(java.lang.Long.valueOf(5L), null),  // null skipped
        // foreign (out-of-contract) values pinning the Mersenne-fold
        // guard: just outside the 2^39 fast-path bound, far outside it,
        // and negative — all must take the legacy `%` path and still
        // equal the composable form (kept small enough that h*a cannot
        // overflow, which ANSI mode would turn into an error on the
        // composable side)
        Seq(java.lang.Long.valueOf(1L << 39),
          java.lang.Long.valueOf((1L << 39) - 1), // last in-guard value
          java.lang.Long.valueOf(1L << 45),
          java.lang.Long.valueOf(1L << 50),
          java.lang.Long.valueOf(-5L),
          java.lang.Long.valueOf(-(1L << 30))))
    val df = rows.toDF("hsh")
    val k = 6
    val native = (0 until k).map(i =>
      element_at(MinHashOverHashed(col("hsh"), k), i + 1).as(s"n$i"))
    val composed = H.minhashSeeds(k).zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("hsh"), h => (h * a + b) % H.P)).as(s"c$i")
    }
    val mism = df.select(native ++ composed: _*)
      .filter((0 until k).map(i =>
        not(col(s"n$i") <=> col(s"c$i"))).reduce(_ || _))
    assert(mism.isEmpty)
  }

  test("SimHashOverHashed equals the per-bit fold form, edges included") {
    import spark.implicits._
    import graft.functions.SimHashOverHashed
    val rnd = new scala.util.Random(5)
    val rows: Seq[Seq[java.lang.Long]] =
      (1 to 300).map(_ => Seq.fill(rnd.nextInt(12))(
        java.lang.Long.valueOf(rnd.nextInt(1 << 28).toLong))) ++
      Seq(Seq.empty[java.lang.Long],            // empty -> ALL bits set
        Seq(null.asInstanceOf[java.lang.Long]), // null elem -> -1 every bit
        Seq(java.lang.Long.valueOf(7L), null),
        // SWAR-lane edges: arrays past the 255-element byte-counter
        // flush boundary (254/255/256/600 elements, nulls mixed in),
        // foreign values using every chunk incl. the sign bit, and an
        // exact 50/50 tie (2*ones == n -> bit set)
        Seq.fill(254)(java.lang.Long.valueOf(1L)),
        Seq.fill(255)(java.lang.Long.valueOf(3L)),
        Seq.fill(256)(java.lang.Long.valueOf(1L << 15)),
        (1 to 600).map(i => if (i % 7 == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(1 << 28).toLong)),
        Seq(java.lang.Long.valueOf(-1L), java.lang.Long.valueOf(Long.MinValue),
          java.lang.Long.valueOf(Long.MaxValue)),
        Seq(java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)))
    val df = rows.toDF("hsh")
    for (bits <- Seq(16, 64)) {
      val composed = (0 until bits).map { j =>
        val contrib = aggregate(col("hsh"), lit(0L), (acc, h) =>
          acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        when(contrib >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      val mism = df.select(SimHashOverHashed(col("hsh"), bits).as("n"),
          composed.as("c"))
        .filter(not(col("n") <=> col("c")))
      assert(mism.isEmpty, s"bits=$bits")
    }
    // the empty-array edge really is the all-ones signature
    val empty = Seq(Seq.empty[java.lang.Long]).toDF("hsh")
      .select(SimHashOverHashed(col("hsh"), 64)).collect().head.getLong(0)
    assert(empty === -1L)
  }

  // the composable shingle form the fused kernels replaced — kept here
  // as the reference semantics both ShingleStrings and HashedShingles
  // are pinned against (it is also exactly what shinglesOverTkSql spells
  // out for the DuckDB oracle).
  private def composableShingles(text: org.apache.spark.sql.Column, k: Int) = {
    val tk = split(lower(text), "\\s+")
    when(size(tk) >= k,
      transform(sequence(lit(1), size(tk) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(tk, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  private def shingleFixture = {
    // edge cases the fused kernels must share with the composable form:
    // empty text (one empty token), leading/trailing/multi whitespace
    // (leading separator -> leading empty token), tabs/newlines, case
    // folding, unicode, exactly-k and k-1 token docs, long docs.
    val tricky = Seq("", "one", "one two", "one two three",
      "  leading", "trailing  ", "a  b\tc\nd", "UPPER Case MiX",
      "héllo wörld é中文 tokens here", "a b a b a b a b",
      (1 to 200).map(i => s"w${i % 17}").mkString(" "),
      // null text: every kernel AND every composable reference chain in
      // these identity tests maps it to an empty list (the when-guard's
      // otherwise branch), pinning the dropEmpty form too
      null: String)
    val rng = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "Gamma", "DELTA", "e", "zz", "中")
    tricky ++ (1 to 300).map(_ =>
      (0 until rng.nextInt(12)).map(_ => words(rng.nextInt(words.length)))
        .mkString(if (rng.nextBoolean()) " " else "  "))
  }

  test("HashedShingles equals transform(shingles, sha28/sha60) for k=1,2,3") {
    import spark.implicits._
    val df = shingleFixture.toDF("s")
    Seq(1, 2, 3).foreach { k =>
      val mism = df.select(
          Hashing.hashedShingles(col("s"), k).as("fast28"),
          transform(composableShingles(col("s"), k),
            x => Hashing.sha28(x)).as("ref28"),
          graft.functions.HashedShingles(col("s"), k, 15).as("fast60"),
          transform(composableShingles(col("s"), k),
            x => Hashing.sha60(x)).as("ref60"))
        .filter(not(col("fast28") <=> col("ref28")) ||
          not(col("fast60") <=> col("ref60")))
      assert(mism.isEmpty, s"fused shingle-hash kernel diverged at k=$k")
    }
    // null text: the composable form's when-guard yields an EMPTY list
    val n = df.limit(1).select(
      Hashing.hashedShingles(lit(null).cast("string"), 3).as("h")).head()
    assert(n.getSeq[Long](0).isEmpty)
  }

  test("ShingleStrings (Dedup.shingles) equals the composable form") {
    import spark.implicits._
    import graft.operators.Dedup
    val df = shingleFixture.toDF("s")
    Seq(1, 2, 3).foreach { k =>
      val mism = df.select(
          Dedup.shingles(col("s"), k).as("fast"),
          composableShingles(col("s"), k).as("ref"))
        .filter(not(col("fast") <=> col("ref")))
      assert(mism.isEmpty, s"fused shingle-string kernel diverged at k=$k")
    }
    val n = df.limit(1).select(
      Dedup.shingles(lit(null).cast("string"), 2).as("g")).head()
    assert(n.getSeq[String](0).isEmpty)
  }

  test("ShingleStrings dropEmpty equals the filter-then-window composable chain") {
    import spark.implicits._
    import graft.functions.ShingleStrings
    val df = shingleFixture.toDF("s")
    // composable reference: drop empty tokens FIRST (the t10 preamble),
    // then window — a leading separator must not yield an empty-token
    // shingle, and the windows must be adjacency in the FILTERED array
    def ref(k: Int) = {
      val tk = filter(split(lower(col("s")), "\\s+"), t => t =!= "")
      when(size(tk) >= k,
        transform(sequence(lit(1), size(tk) - (k - 1)),
          i => concat_ws(" ", (0 until k).map(j => element_at(tk, i + j)): _*)))
        .otherwise(array().cast("array<string>"))
    }
    Seq(1, 2, 3).foreach { k =>
      val mism = df.select(
          ShingleStrings(col("s"), k, dropEmpty = true).as("fast"),
          ref(k).as("ref"))
        .filter(not(col("fast") <=> col("ref")))
      assert(mism.isEmpty, s"dropEmpty shingle kernel diverged at k=$k")
    }
  }

  test("VecDot/VecSqDist equal the zip_with+aggregate folds, edges included") {
    import spark.implicits._
    import graft.functions.{VecDot, VecSqDist}
    val rng = new scala.util.Random(11)
    // float-vector pairs incl. equal/unequal lengths, empty, null
    // elements, null arrays, NaN/Inf — every edge the composable fold
    // defines semantics for.
    val rows: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])] =
      (1 to 300).map { _ =>
        val n = rng.nextInt(9)
        val m = if (rng.nextInt(10) == 0) n + 1 else n
        (Seq.fill(n)(java.lang.Float.valueOf(rng.nextFloat() * 4 - 2)),
         Seq.fill(m)(java.lang.Float.valueOf(rng.nextFloat() * 4 - 2)))
      } ++ Seq(
        (Seq.empty, Seq.empty),
        (Seq(java.lang.Float.valueOf(1f), null), Seq(java.lang.Float.valueOf(2f), java.lang.Float.valueOf(3f))),
        (Seq(java.lang.Float.valueOf(Float.NaN)), Seq(java.lang.Float.valueOf(1f))),
        (Seq(java.lang.Float.valueOf(Float.PositiveInfinity)), Seq(java.lang.Float.valueOf(2f))))
    val df = rows.toDF("x", "y")
    def refDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def refSq(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => (p.cast("double") - q.cast("double")) *
        (p.cast("double") - q.cast("double"))), lit(0.0), (acc, v) => acc + v)
    val mism = df.select(
        VecDot(col("x"), col("y")).as("fd"), refDot(col("x"), col("y")).as("rd"),
        VecSqDist(col("x"), col("y")).as("fs"), refSq(col("x"), col("y")).as("rs"))
      .filter(not(col("fd") <=> col("rd")) || not(col("fs") <=> col("rs")))
    assert(mism.isEmpty, "fused vector fold diverged from the composable form")
    // null arrays propagate
    val n = df.limit(1).select(
      VecDot(lit(null).cast("array<float>"), col("y")).as("d")).head()
    assert(n.isNullAt(0))
    // double-literal right side (the centroid-table shape)
    val mism2 = df.select(
        VecSqDist(col("x"), typedLit(Seq(0.5, -1.25, 2.0))).as("f"),
        refSq(col("x"), typedLit(Seq(0.5, -1.25, 2.0))).as("r"))
      .filter(not(col("f") <=> col("r")))
    assert(mism2.isEmpty)
  }

  test("TokenSetHits/LangBest/PolyHashFold equal their composable forms") {
    import spark.implicits._
    import graft.functions.{LangBest, PolyHashFold, TokenSetHits}
    import graft.operators.TextAnalysis.{langMarkers, qualityStopwords, tokens}
    // marker-dense and marker-free docs, mixed case, multi-space, empty
    val docs = Seq("the cat and the dog is in a hat", "el que y en la es",
      "der und das nicht mit ist", "le la de et un en est",
      "de5 shi4 le5 wo3", "no markers here at all", "", "THE AND la DE",
      "  the  ", "one de la the und", "a b c d e f g h i j k l") ++ {
      val rng = new scala.util.Random(5)
      val vocab = langMarkers.flatMap(_._2) ++ Seq("xx", "yy", "zz", "Q")
      (1 to 200).map(_ => (0 until rng.nextInt(15))
        .map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val df = docs.toDF("s")
    // TokenSetHits vs size(filter(tk, array_contains))
    val m1 = df.select(
        TokenSetHits(col("s"), qualityStopwords).as("fast"),
        size(filter(tokens(col("s")),
          x => array_contains(typedLit(qualityStopwords), x))).as("ref"))
      .filter(not(col("fast") <=> col("ref")))
    assert(m1.isEmpty, "TokenSetHits diverged")
    // LangBest vs the composable argmax fold
    def refLang(text: org.apache.spark.sql.Column) = {
      val tk = tokens(text)
      val scored = langMarkers.map { case (lang, words) =>
        struct(size(filter(tk, t => array_contains(typedLit(words), t))).as("s"),
          lit(lang).as("l"))
      }
      aggregate(array(scored: _*), scored.head,
        (acc, x) => when(x.getField("s") > acc.getField("s") ||
          (x.getField("s") === acc.getField("s") &&
            x.getField("l") < acc.getField("l")), x).otherwise(acc))
        .getField("l")
    }
    val m2 = df.select(LangBest(col("s"), langMarkers).as("fast"),
        refLang(col("s")).as("ref"))
      .filter(not(col("fast") <=> col("ref")))
    assert(m2.isEmpty, "LangBest diverged")
    // null text: the composable fold keeps the seed accumulator -> the
    // first marker language, never null
    val nl = df.limit(1).select(
      LangBest(lit(null).cast("string"), langMarkers).as("l")).head()
    assert(nl.getString(0) == langMarkers.head._1)
    // PolyHashFold vs aggregate((acc * 31 + h) % P), null edges included
    val arrs: Seq[Seq[java.lang.Long]] = Seq(
      Seq.empty, Seq(java.lang.Long.valueOf(7L)),
      Seq(java.lang.Long.valueOf(1L), null, java.lang.Long.valueOf(2L)),
      // foreign values pinning the Mersenne-fold guard: a 60-bit hash
      // (inside the widened 2^61 fast-path bound) and one just past it
      // (legacy `%`)
      Seq(java.lang.Long.valueOf((1L << 60) + 12345L),
        java.lang.Long.valueOf(1L << 61),
        java.lang.Long.valueOf(7L)),
      // a LEADING negative element leaves a negative remainder
      // (acc = -3), which must force the NEXT step onto the legacy
      // path (acc >= 0 guard) and still match the composable fold
      Seq(java.lang.Long.valueOf(-3L),
        java.lang.Long.valueOf(99L),
        java.lang.Long.valueOf(7L))) ++ {
      val rng = new scala.util.Random(9)
      (1 to 200).map(_ => Seq.fill(rng.nextInt(20))(
        java.lang.Long.valueOf(rng.nextInt(1 << 28).toLong)))
    }
    val da = arrs.toDF("h")
    val m3 = da.select(
        PolyHashFold(col("h"), 31L, Hashing.P).as("fast"),
        aggregate(col("h"), lit(0L),
          (acc, h) => (acc * 31L + h) % Hashing.P).as("ref"))
      .filter(not(col("fast") <=> col("ref")))
    assert(m3.isEmpty, "PolyHashFold diverged")
  }

  test("PunctCharCount/RegexTokenCount equal their regex forms") {
    import spark.implicits._
    import graft.functions.{PunctCharCount, RegexTokenCount}
    import graft.operators.TextAnalysis.tokenRegex
    val docs = Seq("", "abc", "a1b2c3", "hello, world!", "a.b.c...",
      "  tabs\tand\nnewlines\f\r", "héllo wörld 中文 😀 ok",
      "#tag #tag2 ...", "123 456 abc789def", "!@#$%^&*()",
      "mixed 中a1文b2 end", " nbsp ", "a" * 300 + "." + "9" * 50) ++ {
      val rng = new scala.util.Random(13)
      val chars = "abcXYZ019 .,!?#-\t中é😀".toCharArray
      (1 to 200).map(_ => (0 until rng.nextInt(60))
        .map(_ => chars(rng.nextInt(chars.length))).mkString)
    }
    val df = docs.toDF("s")
    val m = df.select(
        PunctCharCount(col("s")).as("fp"),
        (length(col("s")) -
          length(regexp_replace(col("s"), "[^a-zA-Z0-9\\s]", ""))).as("rp"),
        RegexTokenCount(col("s")).as("ft"),
        size(regexp_extract_all(col("s"), lit(tokenRegex), lit(0))).as("rt"))
      .filter(not(col("fp") <=> col("rp")) || not(col("ft") <=> col("rt")))
    assert(m.isEmpty, "fused char-class counters diverged from the regex forms")
    // null propagates like the composable forms
    val n = df.limit(1).select(
      PunctCharCount(lit(null).cast("string")).as("a"),
      RegexTokenCount(lit(null).cast("string")).as("b")).head()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("ShaPrefixLong survives both codegen and interpreted eval") {
    import spark.implicits._
    val df = Seq("x", "y", "z").toDF("s")
    // interpreted path: eval through a filter on the driver via collect of
    // the expression output, codegen path: the projection above. Compare
    // against precomputed constants so a dual-path bug can't cancel out.
    val out = df.select(ShaPrefixLong(col("s"), 7).as("h")).orderBy("s")
      .as[Long].collect().toSeq
    val expected = Seq("x", "y", "z").map { s =>
      val dig = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(dig.take(4).map("%02x".format(_)).mkString.take(7), 16)
    }
    assert(out == expected)
  }

  test("HashedBucketCounts equals the per-bucket filter-count composable form") {
    import spark.implicits._
    import graft.functions.{HashedBucketCounts, ShingleStrings}
    val B = 16
    val df = shingleFixture.toDF("s")
    // composable reference: unigram+bigram dropEmpty shingles, sha28 per
    // feature, one interpreted filter-count per bucket (the shape the
    // kernel exists to avoid)
    val feats = concat(
      ShingleStrings(col("s"), 1, dropEmpty = true),
      ShingleStrings(col("s"), 2, dropEmpty = true))
    val ref = array((0 until B).map(b =>
      size(filter(feats, f => pmod(Hashing.sha28(f), lit(B)) === b))
        .cast("long")): _*)
    val mism = df.select(HashedBucketCounts(col("s"), B).as("fast"),
        ref.as("ref"))
      .filter(not(col("fast") <=> col("ref")))
    assert(mism.isEmpty, "bucket-count kernel diverged from the composable form")
  }
}
