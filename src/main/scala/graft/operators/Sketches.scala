package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Distributed, mergeable sketches for corpus-scale statistics.
  *
  * At 100 TB the interesting per-corpus numbers — distinct n-grams,
  * per-term frequencies — are exactly the ones an exact GROUP BY cannot
  * afford (the distinct-shingle key space is Heaps-law unbounded). Both
  * sketches here are one-pass, map-side-combinable aggregates whose merge
  * is associative (register max / cell sum), so a 1000-executor cluster
  * builds them with a single tiny shuffle of fixed size (m registers /
  * depth×width cells), independent of corpus size.
  *
  * Unlike engine-native approximations (`approx_count_distinct`'s
  * HLL++, which is not reproducible outside Spark), these sketches are
  * derived from the portable SHA hashes in [[Hashing]], and the
  * estimator arithmetic is kept in exact-integer domain (sum of
  * power-of-two register weights) until a single final division — so
  * the DuckDB oracle replays them bit-for-bit and the driver's hash
  * gate applies to an *approximate* operator.
  *
  * Reference behavior grounded in the published HyperLogLog (Flajolet
  * et al. 2007) and Count-Min (Cormode & Muthukrishnan 2005) papers;
  * the reference repo has no sketch surface (its pandas passes are
  * exact), so these are beyond-reference scale operators.
  */
object Sketches {

  /** Register-count exponent: m = 2^p = 1024 registers. */
  val P: Int = 10
  val M: Int = 1 << P

  /** Bits of the 60-bit [[Hashing.sha60]] hash left after the bucket
    * index is consumed; rho ranges over [1, W + 1]. */
  val W: Int = 60 - P

  /** 2^(W+1): the fixed-point scale that turns sum(2^-rho) into an
    * exact integer sum (each addend 2^(W+1-rho) is a positive integer,
    * and m * 2^(W+1) < 2^62 cannot overflow). */
  val Scale: Long = 1L << (W + 1)

  /** alpha_m * m^2 * 2^(W+1) — the raw-estimate numerator, embedded as
    * one double literal (17 significant digits round-trip exactly, so
    * both engines divide the identical numerator by the identical
    * integer denominator). */
  val RawNumerator: Double =
    0.7213 / (1.0 + 1.079 / M.toDouble) * M.toDouble * M.toDouble * Scale.toDouble
  private val rawNumeratorLit: String = f"$RawNumerator%.17e"

  /** HyperLogLog register table for the values of `valueCol` within each
    * group: (group, bucket, m_reg) with m_reg = max rho. This is the
    * mergeable form — registers for a union of groups are the per-bucket
    * MAX of the groups' registers, which [[hllEstimate]] exploits and
    * SketchesSpec pins. */
  /** (bucket, rho) register coordinates of one value — the shared core
    * of the batch and streaming register builds. rho = leading zeros of
    * the W-bit hash suffix + 1 = W + 1 - bitlen(w); length(bin(w)) is
    * the exact integer bitlen in both engines (no float log2 whose
    * boundary rounding could diverge). */
  def registerCols(value: Column): (Column, Column) =
    registerColsFromHash(Hashing.sha60(value))

  /** [[registerCols]] over an ALREADY-computed 60-bit hash column — the
    * shape used when the hash is taken upstream so heavier stages
    * (distinct, shuffle) move longs instead of strings. */
  def registerColsFromHash(h: Column): (Column, Column) = {
    val w = shiftright(h, P)
    (pmod(h, lit(M.toLong)),
      when(w === 0, lit(W + 1)).otherwise(lit(W + 1) - length(bin(w))))
  }

  /** Register table from a (grp, h) frame of 60-bit hashes. */
  def hllRegistersFromHash(df: DataFrame): DataFrame = {
    val (bucket, rho) = registerColsFromHash(col("h"))
    df.select(col("grp"), bucket.as("bucket"), rho.as("rho"))
      .groupBy("grp", "bucket").agg(max("rho").as("m_reg"))
  }

  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val (bucket, rho) = registerCols(col(valueCol))
    df.select(col(groupCol).as("grp"), bucket.as("bucket"), rho.as("rho"))
      .groupBy("grp", "bucket").agg(max("rho").as("m_reg"))
  }

  /** HLL estimate per group from a register table. All arithmetic before
    * the final division is exact-integer: S = sum 2^(W+1-rho) over used
    * registers + 2^(W+1) per empty register. Small-range (linear
    * counting) correction per the HLL paper; no large-range correction
    * is needed at a 60-bit hash domain. */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs.groupBy("grp")
      .agg(count(lit(1)).as("n_buckets_used"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${W + 1} - m_reg)")).as("s_used"))
      .withColumn("zeros", lit(M.toLong) - col("n_buckets_used"))
      .withColumn("s_total", col("s_used") + col("zeros") * lit(Scale))
      .withColumn("raw",
        expr(s"CAST($rawNumeratorLit AS DOUBLE)") / col("s_total").cast("double"))
      .withColumn("hll_estimate",
        round(when(col("raw") <= lit(2.5 * M) && col("zeros") > 0,
            lit(M.toDouble) * log(lit(M.toDouble) / col("zeros").cast("double")))
          .otherwise(col("raw")), 6))
      .select(col("grp"), col("n_buckets_used"), col("hll_estimate"))

  /** Per-source distinct k-shingle diversity via HLL, plus the merged
    * "ALL" row computed by register-max merge of the per-source register
    * tables (NOT by re-scanning the corpus) — the sketch property that
    * makes corpus-wide distinct counts a fixed-size reduce at 100 TB.
    * The exact distinct counts ride along as the audit column (at scale
    * you would drop them; they are the quantity the sketch replaces). */
  def hllShingleDiversity(docs: DataFrame, sourceCol: String,
                          textCol: String, k: Int): DataFrame = {
    // round-robin spread: the driver testdata parquet is a single row
    // group, so without this the shingle+hash pass runs as ONE task
    // (the minhashSignature pattern)
    val sh = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(sourceCol).as("grp"),
        explode(Dedup.shingles(col(textCol), k)).as("g"))
    // Hash FIRST, then distinct: the map side reduces each shingle
    // string to its 60-bit fingerprint before anything shuffles, so the
    // distinct exchange — the measured dominant cost at depth — moves 8
    // bytes per row instead of shingle strings. Registers and the HLL
    // estimate are functions of the hash anyway; the exact-audit columns
    // are therefore defined as EXACT DISTINCT FINGERPRINT counts
    // (collision probability ~n²/2^61 — negligible, and identical in
    // both engines by construction). The distinct frame is MATERIALIZED
    // once (checkpoint): its three consumers aggregate differently, so
    // after the distinct-rewrite passes their subtrees no longer
    // canonicalize equal and ReuseExchange alone would re-explode the
    // corpus per consumer (measured 4 scan branches).
    val d = sh.select(col("grp"), Hashing.sha60(col("g")).as("h"))
      .distinct().localCheckpoint()
    val regsSrc = hllRegistersFromHash(d)
    val regsAll = regsSrc.groupBy("bucket").agg(max("m_reg").as("m_reg"))
      .select(lit("ALL").as("grp"), col("bucket"), col("m_reg"))
    val est = hllEstimate(regsSrc.unionByName(regsAll))
    val exactSrc = d.groupBy("grp").agg(count(lit(1)).as("n_exact"))
    val exactAll = d.select("h").distinct().agg(count(lit(1)).as("n_exact"))
      .select(lit("ALL").as("grp"), col("n_exact"))
    est.join(exactSrc.unionByName(exactAll), Seq("grp"))
      .select(col("grp").as("source"), col("n_exact"), col("n_buckets_used"),
        col("hll_estimate"),
        round(abs(col("hll_estimate") - col("n_exact").cast("double")) /
          col("n_exact"), 6).as("rel_error"))
  }

  /** DuckDB twin of [[hllShingleDiversity]]. */
  def hllShingleDiversitySql(docsRel: String, sourceCol: String,
                             textExpr: String, k: Int): String = {
    val h = Hashing.sha60Sql("g")
    s"""WITH tok AS (
       |  SELECT $sourceCol AS grp,
       |    string_split_regex(lower($textExpr), '\\s+') AS tk
       |  FROM $docsRel),
       |sh AS (
       |  SELECT grp, unnest(${Dedup.shinglesOverTkSql(k)}) AS g FROM tok),
       |dh AS (SELECT DISTINCT grp, $h AS h FROM sh),
       |rr AS (SELECT grp, h % $M AS bucket, h >> $P AS w FROM dh),
       |rho AS (
       |  SELECT grp, bucket,
       |    CASE WHEN w = 0 THEN ${W + 1} ELSE ${W + 1} - length(bin(w)) END AS rho
       |  FROM rr),
       |regs_src AS (SELECT grp, bucket, max(rho) AS m_reg FROM rho GROUP BY 1, 2),
       |regs AS (
       |  SELECT * FROM regs_src
       |  UNION ALL
       |  SELECT 'ALL' AS grp, bucket, max(m_reg) AS m_reg FROM regs_src GROUP BY 2),
       |est AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS n_buckets_used,
       |    CAST(sum(1::BIGINT << (${W + 1} - m_reg)) AS BIGINT) AS s_used
       |  FROM regs GROUP BY 1),
       |est2 AS (
       |  SELECT grp, n_buckets_used, $M - n_buckets_used AS zeros,
       |    s_used + ($M - n_buckets_used) * ${Scale}::BIGINT AS s_total
       |  FROM est),
       |est3 AS (
       |  SELECT grp, n_buckets_used, zeros,
       |    CAST($rawNumeratorLit AS DOUBLE) / CAST(s_total AS DOUBLE) AS raw
       |  FROM est2),
       |est4 AS (
       |  SELECT grp, n_buckets_used,
       |    round(CASE WHEN raw <= ${2.5 * M} AND zeros > 0
       |      THEN ${M.toDouble} * ln(${M.toDouble} / CAST(zeros AS DOUBLE))
       |      ELSE raw END, 6) AS hll_estimate
       |  FROM est3),
       |ex AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS n_exact FROM dh GROUP BY 1
       |  UNION ALL
       |  SELECT 'ALL' AS grp, CAST(count(DISTINCT h) AS BIGINT) AS n_exact FROM dh),
       |j AS (
       |  SELECT e.grp AS source, x.n_exact, e.n_buckets_used, e.hll_estimate,
       |    round(abs(e.hll_estimate - CAST(x.n_exact AS DOUBLE)) / x.n_exact, 6)
       |      AS rel_error
       |  FROM est4 e JOIN ex x ON e.grp = x.grp)
       |SELECT * FROM j""".stripMargin
  }

  /** Pairwise source-overlap estimates from the per-source HLL registers
    * ALONE — no second corpus pass: |A∩B| ≈ |A| + |B| − |A∪B| by
    * inclusion–exclusion, where the union sketch of any pair is the
    * register-max merge. The whole computation after the one register
    * build is bounded by sources² × m rows (corpus-independent), vs
    * t19's exact overlap whose shingle-mask pass is corpus-sized — this
    * is the form that still works when the corpus is 100 TB and sources
    * number in the thousands. Pair expansion is two broadcast equi-joins
    * against the bounded pair dimension (no non-equi join). Estimates
    * clamp at 0 (inclusion–exclusion can go slightly negative at sketch
    * error). */
  def hllPairwiseOverlap(docs: DataFrame, sourceCol: String,
                         textCol: String, k: Int): DataFrame = {
    // round-robin spread: the driver testdata parquet is a single row
    // group, so without this the shingle+hash pass runs as ONE task
    // (the minhashSignature pattern)
    val sh = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(sourceCol).as("grp"),
      explode(Dedup.shingles(col(textCol), k)).as("g"))
    // hash-then-distinct (the t25 shuffle argument), then MATERIALIZE
    // the register table: it is consumed by the single-source estimates
    // and both sides of the pair expansion, and it is fixed-size
    // (sources × m rows) — exactly what a sketch is for. Everything
    // downstream of this checkpoint is corpus-independent.
    val regs = hllRegistersFromHash(
      sh.select(col("grp"), Hashing.sha60(col("g")).as("h")).distinct())
      .localCheckpoint()
    val single = hllEstimate(regs)
      .select(col("grp"), col("hll_estimate"))
    val srcs = regs.select(col("grp")).distinct()
    // sources² pair dimension (t19's bounded-dimension pattern) —
    // checkpointed since three consumers reference it and the build is
    // the one non-equi join in the plan
    val pairDim = srcs.select(col("grp").as("src_a"))
      .crossJoin(srcs.select(col("grp").as("src_b")))
      .filter(col("src_a") < col("src_b"))
      .localCheckpoint()
    val pairRegs = regs.join(broadcast(pairDim), col("grp") === col("src_a"))
      .select(col("src_a"), col("src_b"), col("bucket"), col("m_reg"))
      .unionByName(
        regs.join(broadcast(pairDim), col("grp") === col("src_b"))
          .select(col("src_a"), col("src_b"), col("bucket"), col("m_reg")))
    val unionEst = hllEstimate(
        pairRegs.select(concat(col("src_a"), lit("|"), col("src_b")).as("grp"),
          col("bucket"), col("m_reg"))
          .groupBy("grp", "bucket").agg(max("m_reg").as("m_reg")))
      .select(col("grp"), col("hll_estimate").as("est_union"))
    pairDim
      .join(single.select(col("grp").as("src_a"), col("hll_estimate").as("est_a")),
        Seq("src_a"))
      .join(single.select(col("grp").as("src_b"), col("hll_estimate").as("est_b")),
        Seq("src_b"))
      .join(unionEst.withColumn("src_a", split(col("grp"), "\\|")(0))
          .withColumn("src_b", split(col("grp"), "\\|")(1))
          .select("src_a", "src_b", "est_union"),
        Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
        col("est_union"),
        round(greatest(col("est_a") + col("est_b") - col("est_union"),
          lit(0.0)), 6).as("est_intersect"))
  }

  /** DuckDB twin of [[hllPairwiseOverlap]]. */
  def hllPairwiseOverlapSql(docsRel: String, sourceCol: String,
                            textExpr: String, k: Int): String = {
    val h = Hashing.sha60Sql("g")
    val estFrom = (src: String) =>
      s"""SELECT grp, CAST(count(*) AS BIGINT) AS n_buckets_used,
         |    CAST(sum(1::BIGINT << (${W + 1} - m_reg)) AS BIGINT) AS s_used
         |  FROM $src GROUP BY 1""".stripMargin
    s"""WITH tok AS (
       |  SELECT $sourceCol AS grp,
       |    string_split_regex(lower($textExpr), '\\s+') AS tk
       |  FROM $docsRel),
       |sh AS (SELECT grp, unnest(${Dedup.shinglesOverTkSql(k)}) AS g FROM tok),
       |rr AS (
       |  SELECT grp, h % $M AS bucket, h >> $P AS w
       |  FROM (SELECT grp, $h AS h FROM sh)),
       |rho AS (
       |  SELECT grp, bucket,
       |    CASE WHEN w = 0 THEN ${W + 1} ELSE ${W + 1} - length(bin(w)) END AS rho
       |  FROM rr),
       |regs AS (SELECT grp, bucket, max(rho) AS m_reg FROM rho GROUP BY 1, 2),
       |pair_dim AS (
       |  SELECT a.grp AS src_a, b.grp AS src_b
       |  FROM (SELECT DISTINCT grp FROM regs) a,
       |       (SELECT DISTINCT grp FROM regs) b
       |  WHERE a.grp < b.grp),
       |pair_regs AS (
       |  SELECT p.src_a, p.src_b, r.bucket, r.m_reg
       |  FROM regs r JOIN pair_dim p ON r.grp = p.src_a
       |  UNION ALL
       |  SELECT p.src_a, p.src_b, r.bucket, r.m_reg
       |  FROM regs r JOIN pair_dim p ON r.grp = p.src_b),
       |union_regs AS (
       |  SELECT src_a || '|' || src_b AS grp, bucket, max(m_reg) AS m_reg
       |  FROM pair_regs GROUP BY 1, 2),
       |est_single_raw AS (
       |  ${estFrom("regs")}),
       |est_union_raw AS (
       |  ${estFrom("union_regs")}),
       |est_all AS (
       |  SELECT grp, n_buckets_used, $M - n_buckets_used AS zeros,
       |    s_used + ($M - n_buckets_used) * ${Scale}::BIGINT AS s_total
       |  FROM (SELECT * FROM est_single_raw UNION ALL SELECT * FROM est_union_raw)),
       |est AS (
       |  SELECT grp,
       |    round(CASE WHEN CAST($rawNumeratorLit AS DOUBLE) / CAST(s_total AS DOUBLE)
       |          <= ${2.5 * M} AND zeros > 0
       |      THEN ${M.toDouble} * ln(${M.toDouble} / CAST(zeros AS DOUBLE))
       |      ELSE CAST($rawNumeratorLit AS DOUBLE) / CAST(s_total AS DOUBLE) END, 6)
       |      AS hll_estimate
       |  FROM est_all)
       |SELECT p.src_a, p.src_b,
       |  ea.hll_estimate AS est_a, eb.hll_estimate AS est_b,
       |  eu.hll_estimate AS est_union,
       |  round(greatest(ea.hll_estimate + eb.hll_estimate - eu.hll_estimate,
       |    0.0), 6) AS est_intersect
       |FROM pair_dim p
       |JOIN est ea ON ea.grp = p.src_a
       |JOIN est eb ON eb.grp = p.src_b
       |JOIN est eu ON eu.grp = p.src_a || '|' || p.src_b""".stripMargin
  }

  /** Count-Min depth (independent hash rows). */
  val CmDepth: Int = 4

  /** Count-Min width (cells per row). Fixture-sized so collisions are
    * real and the overestimate column is honest; at corpus scale width
    * grows (error ~ 2N/width) while the build stays one fixed-size
    * aggregate. */
  val CmWidth: Int = 1024

  private def cmCol(i: Int, g: Column): Column =
    pmod(Hashing.sha28(concat(lit(s"cm$i|"), g)), lit(CmWidth.toLong))

  /** The depth (row, col) cells one value hashes into — shared by the
    * batch build, the probe side, and the streaming variant. */
  def cmCellsOf(value: Column): Column =
    array((0 until CmDepth).map(i =>
      struct(lit(i).as("row_i"), cmCol(i, value).as("col_i"))): _*)

  private def cmColSql(i: Int, gExpr: String): String =
    s"${Hashing.sha28Sql(s"'cm$i|' || $gExpr")} % $CmWidth"

  /** Count-Min sketch over the k-shingle stream of a corpus, probed at
    * the exact top-N shingles: returns (shingle, exact occurrence count,
    * CM estimate = min over depth rows, overestimate). CM is linear, so
    * the build pre-aggregates per-shingle counts map-side and adds them
    * into depth×width cells — one pass, shuffle bounded by the sketch
    * size, merge = cell-wise sum. The estimate upper-bounds the true
    * count by construction (SketchesSpec pins est >= exact). */
  def countMinShingles(docs: DataFrame, textCol: String, k: Int,
                       topN: Int): DataFrame = {
    // the vocab-bounded count table is consumed by BOTH the sketch build
    // and the probe ranking — materialize it once (the dd8 checkpoint
    // contract; Bench's per-run unpersist reclaims the blocks) instead
    // of re-exploding the corpus per consumer
    val counts = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(explode(Dedup.shingles(col(textCol), k)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val cells = counts
      .select(col("cnt"), explode(cmCellsOf(col("g"))).as("rc"))
      .groupBy(col("rc.row_i").as("row_i"), col("rc.col_i").as("col_i"))
      .agg(sum("cnt").as("cell"))
    // probe set: exact top-N shingles (count desc, shingle asc) — a
    // TakeOrdered over the vocab-bounded count table, not a full sort
    val probes = counts
      .orderBy(col("cnt").desc, col("g")).limit(topN)
    val est = probes
      .select(col("g"), col("cnt"), explode(cmCellsOf(col("g"))).as("rc"))
      .select(col("g"), col("cnt"), col("rc.row_i"), col("rc.col_i"))
      .join(broadcast(cells), Seq("row_i", "col_i"))
      .groupBy("g", "cnt").agg(min("cell").as("cm_estimate"))
    est.select(col("g").as("shingle"), col("cnt").as("exact_cnt"),
      col("cm_estimate"),
      (col("cm_estimate") - col("cnt")).as("overestimate"))
  }

  /** DuckDB twin of [[countMinShingles]]. */
  def countMinShinglesSql(docsRel: String, textExpr: String, k: Int,
                          topN: Int): String = {
    val cols = (0 until CmDepth)
      .map(i => s"SELECT g, cnt, $i AS row_i, ${cmColSql(i, "g")} AS col_i FROM counts")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH tok AS (
       |  SELECT string_split_regex(lower($textExpr), '\\s+') AS tk FROM $docsRel),
       |sh AS (SELECT unnest(${Dedup.shinglesOverTkSql(k)}) AS g FROM tok),
       |counts AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt FROM sh GROUP BY 1),
       |hashed AS (
       |  $cols),
       |cells AS (
       |  SELECT row_i, col_i, CAST(sum(cnt) AS BIGINT) AS cell
       |  FROM hashed GROUP BY 1, 2),
       |probes AS (
       |  SELECT g, cnt FROM counts ORDER BY cnt DESC, g LIMIT $topN),
       |probe_cells AS (
       |  SELECT p.g, p.cnt, h.row_i, h.col_i
       |  FROM probes p JOIN hashed h ON p.g = h.g),
       |est AS (
       |  SELECT pc.g, pc.cnt, min(c.cell) AS cm_estimate
       |  FROM probe_cells pc JOIN cells c
       |    ON pc.row_i = c.row_i AND pc.col_i = c.col_i
       |  GROUP BY 1, 2)
       |SELECT g AS shingle, cnt AS exact_cnt, cm_estimate,
       |  cm_estimate - cnt AS overestimate
       |FROM est""".stripMargin
  }
}
