package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Canon.round
import graft.functions.Hashing

/** Deduplication operators for training-data pipelines: exact hash dedup,
  * MinHash signatures + banded LSH candidate pairs, SimHash, and exact
  * n-gram Jaccard. Hashing is SHA-based (see [[graft.functions.Hashing]])
  * so every stage is reproducible in the DuckDB oracle.
  *
  * Scale design: everything is per-row expressions + one aggregation or
  * one equi-join on a band/bucket key. The only pairwise work (Jaccard,
  * LSH verification) happens AFTER blocking (band key or group key), never
  * as a global cross join.
  */
object Dedup {

  /** Word k-shingles of a document, lowercased. Documents shorter than k
    * tokens yield an empty shingle list (Spark's `sequence(1, 0)` DESCENDS,
    * so the short case must be guarded explicitly). */
  def shingles(text: Column, k: Int): Column = {
    val tk = split(lower(text), "\\s+")
    when(size(tk) >= k,
      transform(sequence(lit(1), size(tk) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(tk, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** DuckDB twin of [[shingles]]: 1-indexed lists; `range(a, b)` is [a, b)
    * and empty when a >= b, matching the short-document guard above.
    * Expects a CTE/subquery column `tk` holding the token list. */
  def shinglesOverTkSql(k: Int): String = {
    val parts = (0 until k).map(j => s"tk[i + $j]").mkString(" || ' ' || ")
    s"[$parts for i in range(1, len(tk) - ${k - 2})]"
  }

  /** Exact dedup: group identical texts by SHA-256, keep the minimum id as
    * the canonical representative, count the duplicates. */
  def exactDups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("text_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: k universal hashes min-folded over the shingle
    * set. mh_i = min over shingles of (a_i * sha28(sh) + b_i) mod P. */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String,
                       shingleK: Int, numHashes: Int): DataFrame = {
    val sh = shingles(col(textCol), shingleK)
    val hashed = transform(sh, s => Hashing.sha28(s))
    val sigCols = Hashing.minhashSeeds(numHashes).zipWithIndex.map {
      case ((a, b), i) =>
        array_min(transform(hashed, h => (h * a + b) % Hashing.P)).as(s"mh$i")
    }
    // SHA-per-shingle is CPU-bound: spread rows across all cores first
    // (single-row-group files otherwise scan as ONE task and serialize
    // the whole hashing pass).
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol) +: sigCols: _*)
  }

  /** Scale-safe block key for blocked pairwise ops: one MinHash band of
    * `numHashes` hash values, concatenated. Near-dups land in the same
    * block with the usual LSH probability, and block cardinality grows
    * with the corpus — pairs-per-block stays bounded, unlike a low-
    * cardinality attribute key (source, language, ...) whose blocks grow
    * O(n) and pair counts O(n²). Empty shingle sets hash to -1 so short
    * docs still get a (shared, tiny) block. */
  def minhashBandKey(text: Column, shingleK: Int, numHashes: Int): Column = {
    val hashed = transform(shingles(text, shingleK), s => Hashing.sha28(s))
    val parts = Hashing.minhashSeeds(numHashes).map { case (a, b) =>
      coalesce(array_min(transform(hashed, h => (h * a + b) % Hashing.P)), lit(-1L))
    }
    concat_ws("_", parts: _*)
  }

  /** DuckDB twin of [[minhashBandKey]] (expects token-list column `tk`). */
  def minhashBandKeySql(shingleK: Int, numHashes: Int): String = {
    val parts = (0 until numHashes)
      .map(i => s"coalesce(${minhashSql(shingleK, i)}, -1)")
      .mkString(", ")
    s"concat_ws('_', $parts)"
  }

  /** DuckDB twin of one minhash column (expects token-list column `tk`). */
  def minhashSql(shingleK: Int, i: Int): String = {
    val (a, b) = Hashing.minhashSeeds(i + 1).last
    val sh = shinglesOverTkSql(shingleK)
    s"list_min(list_transform($sh, s -> (${Hashing.sha28Sql("s")} * $a + $b) % ${Hashing.P}))"
  }

  /** DuckDB subquery exposing (extraCols..., tk) over `documents`. */
  def tkSourceSql(textExpr: String, extraCols: String*): String = {
    val cols = (extraCols :+ s"string_split_regex(lower($textExpr), '\\s+') AS tk")
      .mkString(", ")
    s"(SELECT $cols FROM documents)"
  }

  /** Banded-LSH candidate pairs: split the signature into bands of
    * `rowsPerBand` hashes; docs sharing any band key are candidates.
    * One shuffle on the band key — no cross join. Returns distinct
    * (id_a < id_b) candidate pairs. */
  def lshCandidates(sig: DataFrame, idCol: String, numHashes: Int,
                    rowsPerBand: Int): DataFrame = {
    // persist the signature table BEFORE splitting into bands: column
    // pruning would otherwise push each band's projection into the
    // signature pipeline, recomputing shingle+SHA hashing once per band
    // per join side. The signature is k longs per doc — tiny at any scale.
    // NB: the cache is intentionally left registered (unpersisting before
    // the lazy result is consumed would defeat it); Spark evicts LRU, and
    // repeated calls with the same logical plan reuse the same entry.
    // Callers that invoke this repeatedly over DIFFERENT inputs should use
    // [[lshCandidatesEager]], which releases the cache deterministically.
    bandJoin(sig.persist(), idCol, numHashes, rowsPerBand)
  }

  /** [[lshCandidates]] with deterministic cache lifetime: the candidate
    * pairs are materialized eagerly (localCheckpoint severs the lineage,
    * so downstream consumers never re-read the signature), then the
    * signature cache is released. Use for repeated invocations over
    * different inputs, where the lazy variant would accumulate cache
    * entries until LRU pressure. */
  def lshCandidatesEager(sig: DataFrame, idCol: String, numHashes: Int,
                         rowsPerBand: Int): DataFrame = {
    val cached = sig.persist()
    try bandJoin(cached, idCol, numHashes, rowsPerBand).localCheckpoint(eager = true)
    finally cached.unpersist()
  }

  private def bandJoin(cached: DataFrame, idCol: String, numHashes: Int,
                       rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bands = (0 until numBands).map { b =>
      val key = concat_ws("_",
        lit(b) +: (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
      cached.select(col(idCol), key.as("band_key"))
    }
    val exploded = bands.reduce(_ union _)
    val l = exploded.as("l")
    val r = exploded.as("r")
    l.join(r, col("l.band_key") === col("r.band_key") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard verification of candidate pairs (id_a, id_b):
    * joins each side back to its shingle set and keeps pairs with
    * jaccard >= `minJaccard`. This is the 100-TB near-dup path — pairwise
    * work only on LSH candidates, and both attach joins are plain
    * equi-joins on the id (shuffle-distributed, no broadcast of the
    * corpus). Returns (id_a, id_b, jaccard). */
  def verifyPairsJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                         textCol: String, shingleK: Int,
                         minJaccard: Double): DataFrame = {
    // SHA-per-shingle is CPU-bound and the input may be a single split:
    // spread rows first so set-building uses every core (cf.
    // minhashSignature), for BOTH attach sides.
    val sets = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), hashedShingleSet(col(textCol), shingleK).as("sh"))
    val withSets = pairs
      .join(sets.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .filter(sizeRatioPrune(size(col("sh_a")), size(col("sh_b")), minJaccard))
    val inter = graft.functions.SortedLongIntersectCount(col("sh_a"), col("sh_b"))
    jaccardTail(
      withSets.select(col("id_a"), col("id_b"), inter.as("i"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb")),
      minJaccard)
  }

  /** Shared: sorted distinct 64-bit shingle-hash set of a document. */
  private def hashedShingleSet(text: Column, shingleK: Int): Column =
    array_sort(array_distinct(transform(shingles(text, shingleK),
      s => Hashing.sha28(s))))

  /** Shared: size-ratio prune — jaccard <= min(|A|,|B|)/max(|A|,|B|), so
    * pairs under the threshold are rejected on two int compares before
    * the O(|A|+|B|) merge walk. (1e-9 slack keeps boundary pairs that
    * post-round canonicalization could still admit.) */
  private def sizeRatioPrune(nA: Column, nB: Column, minJaccard: Double): Column =
    least(nA, nB).cast("double") >= lit(minJaccard - 1e-9) * greatest(nA, nB)

  /** Shared tail over (id_a, id_b, i, na, nb): the no-op aggregation
    * boundary keeps the merge walk evaluated ONCE per pair (Catalyst
    * would otherwise duplicate the intersect into the filter), then
    * jaccard = i / (na + nb - i), rounded and thresholded. */
  private def jaccardTail(pairRows: DataFrame, minJaccard: Double): DataFrame =
    pairRows
      .groupBy("id_a", "id_b")
      .agg(first("i").as("i"), first("na").as("na"), first("nb").as("nb"))
      .select(col("id_a"), col("id_b"),
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)

  /** Fused LSH-verified near-dup: MinHash signature -> banded candidate
    * pairs -> exact Jaccard verification, with ONE shingle+SHA pass for
    * the whole pipeline. The hashed shingle array is persisted and both
    * the signature (minhash folds) and the verification sets (sorted
    * distinct) derive from it — composing [[minhashSignature]] +
    * [[lshCandidates]] + [[verifyPairsJaccard]] separately would hash
    * the corpus three times. Cache lifetime is deterministic: the result
    * is materialized (localCheckpoint) before the persist is released.
    *
    * 100-TB shape: every stage is an equi-join (band key, then id
    * attach); no broadcast of the corpus, pairwise work only on LSH
    * candidates. The persisted intermediate is (id, long array) — at
    * cluster scale StorageLevel MEMORY_AND_DISK spills it rather than
    * recomputing the hash pass. */
  def lshVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
                       shingleK: Int, numHashes: Int, rowsPerBand: Int,
                       minJaccard: Double): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val hashed = docs
      .repartition(par)
      .select(col(idCol),
        transform(shingles(col(textCol), shingleK), s => Hashing.sha28(s)).as("hsh"))
      .persist()
    try {
      val sigCols = Hashing.minhashSeeds(numHashes).zipWithIndex.map {
        case ((a, b), i) =>
          array_min(transform(col("hsh"), h => (h * a + b) % Hashing.P)).as(s"mh$i")
      }
      val sig = hashed.select(col(idCol) +: sigCols: _*)
      val cand = bandJoin(sig, idCol, numHashes, rowsPerBand)
      val sets = hashed.select(col(idCol),
        array_sort(array_distinct(col("hsh"))).as("sh"))
      val withSets = cand
        .join(sets.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sets.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .filter(sizeRatioPrune(size(col("sh_a")), size(col("sh_b")), minJaccard))
      val inter = graft.functions.SortedLongIntersectCount(col("sh_a"), col("sh_b"))
      jaccardTail(
        withSets.select(col("id_a"), col("id_b"), inter.as("i"),
          size(col("sh_a")).as("na"), size(col("sh_b")).as("nb")),
        minJaccard).localCheckpoint(eager = true)
    } finally hashed.unpersist()
  }

  /** Exact n-gram Jaccard with MinHash-band blocking — the scale-safe
    * default for corpus-wide near-dup: block cardinality grows with the
    * corpus, so pairs-per-block stays bounded (vs an attribute block key
    * whose pair count grows O(n²/k)).
    *
    * Plan shape: the hashed shingle array (`hsh`) is computed ONCE per
    * row in its own projection; the band key and the sorted-distinct
    * verification set both derive from that column. Catalyst's
    * CollapseProject keeps expensive expressions unduplicated across
    * projections, so the per-row cost is a single shingle+SHA pass —
    * computing band key and set independently from the text would
    * triple it. */
  def ngramJaccardPairsBanded(docs: DataFrame, idCol: String, textCol: String,
                              shingleK: Int, bandHashes: Int,
                              minJaccard: Double): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // round-robin spread first: SHA-per-shingle is CPU-bound and the
    // source may scan as a single split (cf. minhashSignature).
    val hashed = docs
      .repartition(par)
      .select(col(idCol),
        transform(shingles(col(textCol), shingleK), s => Hashing.sha28(s)).as("hsh"))
    val bandParts = Hashing.minhashSeeds(bandHashes).map { case (a, b) =>
      coalesce(array_min(transform(col("hsh"), h => (h * a + b) % Hashing.P)), lit(-1L))
    }
    val withSets = hashed.select(
        col(idCol),
        concat_ws("_", bandParts: _*).as("block"),
        array_sort(array_distinct(col("hsh"))).as("sh"))
      .withColumn("nsh", size(col("sh")))
    val l = withSets.as("l")
    val r = withSets.as("r")
    val inter = graft.functions.SortedLongIntersectCount(col("l.sh"), col("r.sh"))
    val cond = col("l.block") === col("r.block") &&
      col(s"l.$idCol") < col(s"r.$idCol") &&
      sizeRatioPrune(col("l.nsh"), col("r.nsh"), minJaccard)
    jaccardTail(
      l.join(r, cond).select(
        col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        inter.as("i"), size(col("l.sh")).as("na"), size(col("r.sh")).as("nb")),
      minJaccard)
  }

  /** SimHash over token 28-bit hashes with `bits` bits: per bit, sign of
    * the sum of (+1 / -1) contributions across tokens; NON-NEGATIVE sum
    * sets the bit (deterministic zero handling). */
  def simhash(text: Column, bits: Int): Column = {
    val hashed = transform(split(lower(text), "\\s+"), t => Hashing.sha28(t))
    val bitCols = (0 until bits).map { j =>
      val contrib = aggregate(hashed, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(contrib >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** DuckDB twin of [[simhash]]. */
  def simhashSql(textExpr: String, bits: Int): String = {
    val tk = s"string_split_regex(lower($textExpr), '\\s+')"
    val hashed = s"list_transform($tk, t -> ${Hashing.sha28Sql("t")})"
    val bitTerms = (0 until bits).map { j =>
      val contrib = s"list_sum(list_transform($hashed, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END))"
      s"(CASE WHEN $contrib >= 0 THEN ${1L << j} ELSE 0 END)"
    }
    bitTerms.mkString("(", " + ", ")")
  }

  /** Exact n-gram Jaccard similarity for pairs blocked by `blockCol`
    * (pairs are only formed within a block — at scale the block key is an
    * LSH band or a cluster id, never the whole corpus). */
  /** @param broadcastBuild replicate the build side to every task.
    *        Default FALSE — the safe plan for an unbounded corpus is the
    *        blocked equi-join (one shuffle on the block key). Pass true
    *        only when the build side is provably bounded (e.g. a fixed
    *        query set).
    *  @param saltBuckets fan out the blocked join when blocks are few and
    *        large: the probe side is salted by `hash(id) % saltBuckets`,
    *        the build side replicated to every salt — parallelism becomes
    *        #blocks x saltBuckets at a bounded (x saltBuckets) shuffle
    *        cost, with no broadcast of an unbounded side. 1 = plain
    *        blocked join (right when blocks are many, e.g. LSH bands). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, shingleK: Int, minJaccard: Double,
                        broadcastBuild: Boolean = false,
                        saltBuckets: Int = 1): DataFrame = {
    // intersect 64-bit shingle hashes, not strings: ~8x less shuffle bytes
    // and integer equality in the pairwise intersect hot loop. The SHA hash
    // is shared with the oracle, so the (collision-negligible) semantics
    // are identical in both engines. Arrays are sorted once per doc so the
    // per-pair intersection is an allocation-free codegen'd merge walk.
    val withSets = docs.select(
        col(blockCol), col(idCol),
        hashedShingleSet(col(textCol), shingleK).as("sh"))
      .withColumn("nsh", size(col("sh")))
    // Round-robin spread of the probe side: the pairwise intersect loop is
    // the hot path and must use every core regardless of how few splits
    // the input scan produced. The build side stays broadcastable.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val l = withSets.repartition(par).as("l")
    // the BUILD side also repartitions: a broadcast collect executes its
    // child plan as-is, and a single-split scan would otherwise compute
    // every shingle hash in one task before broadcasting.
    val r = withSets.repartition(par).as("r")
    // |A∪B| = |A| + |B| - |A∩B|: sizes only, no union array materialized.
    // The intersect count is projected BELOW a (no-op) aggregation on the
    // pair key: without that boundary Catalyst pushes the jaccard filter
    // into the join condition and re-evaluates the intersect expression
    // several times per pair (condition + projection, no cross-operator
    // CSE). With it, the merge walk runs exactly once per pair and only
    // (id, id, 3 ints) rows cross the exchange.
    val inter = graft.functions.SortedLongIntersectCount(col("l.sh"), col("r.sh"))
    val blockCond = col(s"l.$blockCol") === col(s"r.$blockCol") &&
      col(s"l.$idCol") < col(s"r.$idCol") &&
      sizeRatioPrune(col("l.nsh"), col("r.nsh"), minJaccard)
    val joined =
      if (broadcastBuild) l.join(broadcast(r), blockCond)
      else if (saltBuckets <= 1) l.join(r, blockCond)
      else {
        // fragment-replicate: probe rows carry one salt, build rows all of
        // them — each pair matches exactly once, on the probe's salt.
        val ls = withSets.repartition(par)
          .withColumn("salt", pmod(hash(col(idCol)), lit(saltBuckets))).as("l")
        val rs = withSets.repartition(par)
          .withColumn("salt", explode(array((0 until saltBuckets).map(lit): _*))).as("r")
        ls.join(rs, blockCond && col("l.salt") === col("r.salt"))
      }
    jaccardTail(
      joined.select(
        col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        inter.as("i"), size(col("l.sh")).as("na"), size(col("r.sh")).as("nb")),
      minJaccard)
  }
}
