package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import graft.functions.Canon.round

/** ML-prep operators (SURVEY §2.9 M1'/M3, §2.2 F11).
  *
  * M1 (sklearn IterativeImputer with posterior sampling) is stochastic and
  * platform-dependent — a documented semantic-deviation zone (SURVEY
  * §7.5.1). The engine ships the reference's own deterministic fallback
  * (`scripts/run_full_pipeline.py:959-969`): per-segment median imputation
  * with a global-median second pass, both as distributed aggregations.
  */
object Impute {

  /** M1' — per-group median imputation with global-median fallback:
    * nulls take the group's exact median; groups that are entirely null
    * take the global median; still-null (all-null column) takes 0.0.
    * Group stats are one aggregate + a broadcast join — no per-row
    * subqueries, no driver loop over groups. */
  def medianImpute(df: DataFrame, groupCols: Seq[String],
                   features: Seq[String]): DataFrame = {
    val gAggs = features.map(f => percentile(col(f), lit(0.5)).as(s"__gm_$f"))
    val groupStats = df.groupBy(groupCols.map(col): _*).agg(gAggs.head, gAggs.tail: _*)
    val aAggs = features.map(f => percentile(col(f), lit(0.5)).as(s"__am_$f"))
    val globalStats = df.agg(aAggs.head, aAggs.tail: _*)
    val joined = df
      .join(broadcast(groupStats), groupCols, "left")
      .crossJoin(broadcast(globalStats))
    val filled = features.foldLeft(joined)((d, f) =>
      d.withColumn(f,
        coalesce(col(f), col(s"__gm_$f"), col(s"__am_$f"), lit(0.0))))
    filled.drop(features.flatMap(f => Seq(s"__gm_$f", s"__am_$f")): _*)
  }

  /** M1 — deterministic iterative (MICE-style) imputation: per-segment
    * iterated RIDGE regressions, SURVEY §7.5.1 option (a).
    *
    * The reference runs sklearn `IterativeImputer(max_iter=10,
    * random_state=42, sample_posterior=True)` per segment of >= 5 rows
    * (`scripts/run_full_pipeline.py:905-955`); posterior sampling is
    * RNG/platform-dependent, so the engine's contract is the deterministic
    * variant: median seeding (segment median -> global median -> 0.0, the
    * reference's own fallback ladder), then `maxIter` rounds over the
    * features IN GIVEN ORDER, each refitting a ridge regression of the
    * feature on all others over the rows where that feature was ORIGINALLY
    * observed, and rewriting only the originally-missing cells. Segments
    * with fewer than `minSegmentRows` rows keep their seeded values
    * (mirroring the reference's size gate).
    *
    * Scale shape: each regression is ONE distributed aggregation building
    * per-segment Gram matrices (p x p, p = #features, tiny), a driver-side
    * p x p ridge solve per segment, and a broadcast-join update — the
    * A13-style two-phase pattern. Lineage is cut per round with
    * localCheckpoint so plans stay bounded at any maxIter. Ridge lambda
    * penalizes the full diagonal (intercept included) — deterministic and
    * never singular for lambda > 0. */
  def iterativeRidgeImpute(df: DataFrame, segmentCols: Seq[String],
                           features: Seq[String], maxIter: Int = 10,
                           lambda: Double = 1.0,
                           minSegmentRows: Int = 5): DataFrame = {
    require(features.size >= 2, "iterativeRidgeImpute needs >= 2 features")
    val spark = df.sparkSession
    // control-char separator: an empty separator would collide distinct
    // multi-column segments like ("a","bc") and ("ab","c") into one group
    val segKey = concat_ws("", segmentCols.map(c => col(c).cast("string")): _*)

    // originally-observed flags + median seed + segment-size eligibility
    val flagged = features.foldLeft(df)((d, f) =>
      d.withColumn(s"__obs_$f", col(f).isNotNull))
    val seeded = medianImpute(flagged, segmentCols, features)
      .withColumn("__seg", segKey)
    val segSizes = seeded.groupBy("__seg").agg(count(lit(1)).as("__segn"))
    var state = seeded
      .join(broadcast(segSizes), Seq("__seg"))
      .withColumn("__eligible", col("__segn") >= minSegmentRows)
      .localCheckpoint(true)

    for (_ <- 1 to maxIter) {
      for (f <- features) {
        val others = features.filterNot(_ == f)
        val p = others.size + 1 // intercept + predictors
        // one distributed pass: per-segment Gram matrix restricted to rows
        // where f was originally observed
        val aggs = Seq(count(lit(1)).as("n"), sum(col(f)).as("sy")) ++
          others.zipWithIndex.flatMap { case (o, j) =>
            Seq(sum(col(o)).as(s"sx$j"), sum(col(o) * col(f)).as(s"sxy$j"))
          } ++
          others.zipWithIndex.flatMap { case (oj, j) =>
            others.zipWithIndex.collect { case (ok, kk) if kk >= j =>
              sum(col(oj) * col(ok)).as(s"sxx${j}_$kk")
            }
          }
        val stats = state.filter(col(s"__obs_$f") && col("__eligible"))
          .groupBy("__seg").agg(aggs.head, aggs.tail: _*)
          .collect()

        // driver solve: (X'X + lambda*I) beta = X'y per segment (p x p)
        val coefRows = stats.toSeq.map { r =>
          val n = r.getAs[Long]("n").toDouble
          val m = Array.ofDim[Double](p, p + 1) // augmented [M | v]
          m(0)(0) = n + lambda
          m(0)(p) = r.getAs[Double]("sy")
          for (j <- others.indices) {
            m(0)(j + 1) = r.getAs[Double](s"sx$j")
            m(j + 1)(0) = r.getAs[Double](s"sx$j")
            m(j + 1)(p) = r.getAs[Double](s"sxy$j")
            for (k <- others.indices) {
              val (a, b) = (math.min(j, k), math.max(j, k))
              m(j + 1)(k + 1) = r.getAs[Double](s"sxx${a}_$b") +
                (if (j == k) lambda else 0.0)
            }
          }
          // Gaussian elimination with partial pivoting
          for (cIdx <- 0 until p) {
            val piv = (cIdx until p).maxBy(rr => math.abs(m(rr)(cIdx)))
            val tmp = m(cIdx); m(cIdx) = m(piv); m(piv) = tmp
            for (rr <- cIdx + 1 until p) {
              val fac = m(rr)(cIdx) / m(cIdx)(cIdx)
              for (cc <- cIdx to p) m(rr)(cc) -= fac * m(cIdx)(cc)
            }
          }
          val beta = new Array[Double](p)
          for (rr <- (p - 1) to 0 by -1) {
            var acc = m(rr)(p)
            for (cc <- rr + 1 until p) acc -= m(rr)(cc) * beta(cc)
            beta(rr) = acc / m(rr)(rr)
          }
          Row.fromSeq(r.getAs[String]("__seg") +: beta.toSeq)
        }
        val coefSchema = StructType(
          StructField("__seg", StringType) +:
            (0 until p).map(i => StructField(s"__b$i", DoubleType)))
        val coefs = spark.createDataFrame(
          spark.sparkContext.parallelize(coefRows, 1), coefSchema)

        val pred = others.zipWithIndex
          .map { case (o, j) => col(s"__b${j + 1}") * col(o) }
          .foldLeft(col("__b0"))(_ + _)
        state = state
          .join(broadcast(coefs), Seq("__seg"), "left")
          .withColumn(f,
            when(!col(s"__obs_$f") && col("__b0").isNotNull, pred)
              .otherwise(col(f)))
          .drop((0 until p).map(i => s"__b$i"): _*)
      }
      // bound plan depth: one lineage cut per round. LAZY (eager = false):
      // the plan is truncated immediately, and the blocks materialize
      // inside the NEXT round's first stats collect (which scans every
      // partition anyway) instead of as their own sequential driver job —
      // at 10 rounds that is 10 fewer jobs of pure scheduling floor, with
      // identical values (lazy vs eager changes when blocks materialize,
      // never what they hold).
      state = state.localCheckpoint(eager = false)
    }
    state.drop((features.map(f => s"__obs_$f") ++
      Seq("__seg", "__segn", "__eligible")): _*)
  }

  /** M3 — anti-leak standard scaling: fit mean/std on the TRAIN rows only
    * (`trainPred`), apply to every row. The fitted stats are two scalars
    * per feature broadcast back — the reference's per-fold
    * fit-on-train-only contract (`src/etl/ml_extended_utils.py:249-290`). */
  def scaleFitOnTrain(df: DataFrame, trainPred: Column,
                      features: Seq[String]): DataFrame = {
    val aggs = features.flatMap(f => Seq(
      avg(when(trainPred, col(f))).as(s"__m_$f"),
      stddev_samp(when(trainPred, col(f))).as(s"__s_$f")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val scaled = features.foldLeft(joined)((d, f) =>
      d.withColumn(s"${f}_scaled",
        round(when(col(s"__s_$f").isNotNull && col(s"__s_$f") > 0,
          (col(f) - col(s"__m_$f")) / col(s"__s_$f"))
          .otherwise(lit(0.0)), 6)))
    scaled.drop(features.flatMap(f => Seq(s"__m_$f", s"__s_$f")): _*)
  }

  /** F11 — anti-leak column drop with assertion: removing label-derived
    * columns before ML, failing loudly if any survive. */
  def antiLeakDrop(df: DataFrame, leakCols: Seq[String]): DataFrame = {
    val out = df.drop(leakCols: _*)
    val leaked = out.columns.toSet.intersect(leakCols.toSet)
    require(leaked.isEmpty, s"anti-leak drop failed for: $leaked")
    out
  }
}
