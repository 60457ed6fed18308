package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level wall-clock profile of the two e2e compositions
  * (e2e_corpus_assembly and e2e_llm_prep; dev tool): times each pipeline
  * stage CUMULATIVELY (count() from the raw scan through stage k) at one
  * scale dir, so a superlinear stage shows up as the step where
  * cumulative time jumps.
  *
  * Every stage BUILDS ITS PIPELINE FRESH inside the timed closure: the
  * composition's stage boundaries are eager `localCheckpoint`s whose
  * lineage is truncated, so a checkpointed frame held across stages
  * would either be unrecomputable after the per-stage unpersist sweep
  * (Spark's "checkpoint block not found" failure) or would silently
  * time a cached count instead of the stage. Rebuilding per closure
  * means stage k's number is exactly scan..k, paid in full, every time.
  *
  * Writes `PROFILE_E2E.json` (cumulative + delta seconds per stage) so
  * [[ScaleCurve]] can render the committed stage table from measured
  * data instead of hardcoded literals. Run:
  * `sbt "runMain graft.tools.ProfileE2E /tmp/graft_scale/sf10g"`. */
object ProfileE2E {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/sf1g")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.CorpusPipeline
    import graft.operators.{Dedup, TextAnalysis}
    import graft.core.Tables

    var results = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Long)]
    // min of 2 per stage (the Bench/ScaleCurve discipline): cumulative
    // deltas subtract two independently-measured stages, so single-run
    // variance shows up as spurious (even negative) marginal costs on
    // stages whose true delta is near zero.
    def time(label: String)(build: => DataFrame): Unit = {
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        System.gc()
        val t0 = System.nanoTime()
        // the build itself is INSIDE the timed window: prepare()'s eager
        // checkpoint does its work at construction, not at count()
        val n = build.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val a = once()
      val b = once()
      val (sec, n) = (math.min(a._1, b._1), b._2)
      results += ((label, sec, n))
      System.err.println(f"[e2e-stage] $label%-22s $sec%8.2f s  rows=$n")
    }

    val mix = Map("en" -> 0.4, "zh" -> 0.2, "es" -> 0.15, "de" -> 0.15,
      "fr" -> 0.1)
    def docs = Tables.documents(spark, dir)
    def afterExact = CorpusPipeline.dropExactDups(docs, "doc_id", "text")
    def afterNear = CorpusPipeline.dropNearDups(afterExact, "doc_id",
      "text", 3, 6, 3, 0.7)
    time("scan")(docs)
    time("exact_dedup")(afterExact)
    time("near_dedup")(afterNear)
    // prepare = near_dedup + quality/analysis + the checkpoint write;
    // built fresh here so the checkpoint cost lands in THIS window
    time("prepare(analyze)")(CorpusPipeline.prepare(docs, "doc_id", "text"))
    time("mixture") {
      val prepared = CorpusPipeline.prepare(docs, "doc_id", "text")
      TextAnalysis.mixtureSample(prepared, "doc_id", "text", "lang", mix, 0.5)
    }
    time("chunks") {
      val prepared = CorpusPipeline.prepare(docs, "doc_id", "text")
      val mixKeys = TextAnalysis.mixtureSample(prepared, "doc_id", "text",
        "lang", mix, 0.5).select(col("doc_id"), col("lang"))
      val sampled = prepared.join(mixKeys.select("doc_id"), Seq("doc_id"),
        "left_semi")
      TextAnalysis.chunkDocuments(sampled, "doc_id", "text", 30, 5)
    }
    time("full_e2e")(graft.SparkEntry.queries("e2e_corpus_assembly")(spark, dir))
    val assemblyStages = results

    // Second composition: the e2e_llm_prep chain (Gopher rule gate ->
    // exact-substring chunk dedup -> DSIR target selection -> BPE
    // pricing), same cumulative-rebuild discipline. Stage frames mirror
    // the query body in TextQueries.scala exactly (same checkpoints),
    // so the deltas are the marginal costs of the plan the bench times.
    results = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Long)]
    def gated = TextAnalysis.gopherStructuralFilter(
      Tables.documents(spark, dir), "text")
    def dedupBase = {
      val d = gated
      Dedup.chunkDedup(d, "doc_id", "text", 3)
        .select(col("doc_id"), col("dedup_text"))
        .join(d.select("doc_id", "source"), "doc_id")
        .localCheckpoint(true)
    }
    time("gopher_gate")(gated)
    time("chunk_dedup")(dedupBase)
    time("dsir_select") {
      val base = dedupBase
      val weights = TextAnalysis.dsirWeightsByPred(base,
        col("source").isin("src1", "src2", "src3", "src4"), "doc_id",
        "dedup_text", 256)
      base.join(weights.filter(col("log_w") > 0).select("doc_id"), "doc_id")
    }
    time("full_llm_prep")(graft.SparkEntry.queries("e2e_llm_prep")(spark, dir))
    val prepStages = results

    // machine-readable artifact for ScaleCurve's stage tables: cumulative
    // seconds per stage plus the delta vs the previous stage (each stage
    // contains all previous ones, so deltas are the marginal stage costs).
    def stageJson(rs: Seq[(String, Double, Long)]): String =
      rs.zipWithIndex.map { case ((label, sec, n), i) =>
        val delta = if (i == 0) sec else sec - rs(i - 1)._2
        f"""{"stage":"$label","cumulative_sec":$sec%.2f,"delta_sec":$delta%.2f,"rows":$n}"""
      }.mkString("[", ",", "]")
    val pipelines =
      s"""[{"name":"e2e_corpus_assembly","stages":${stageJson(assemblyStages.toSeq)}},""" +
      s"""{"name":"e2e_llm_prep","stages":${stageJson(prepStages.toSeq)}}]"""
    val json = s"""{"dir":"$dir","cpus":$cpus,"pipelines":$pipelines}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PROFILE_E2E.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
