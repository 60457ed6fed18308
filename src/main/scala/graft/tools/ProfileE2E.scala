package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level wall-clock profile of the e2e compositions
  * (e2e_corpus_assembly, e2e_llm_prep, e2e_c4_prep, e2e_decontam_prep;
  * dev tool).
  *
  * Timing discipline (round 10): each stage's MARGINAL cost is measured
  * DIRECTLY — the stage's input frame is materialized (eager
  * localCheckpoint, outside any timed window) and the timed closure runs
  * only the stage body over that input. The previous scheme timed each
  * cumulative prefix and subtracted adjacent measurements; because stage
  * k and stage k+1 were measured at different JVM/codegen warm-up
  * states, the differences could swing negative by seconds (the
  * committed round-9 artifact carried mixture = -7.03 s), which broke
  * the table's one contract: the slowest delta names the next
  * optimization target. Direct marginal timing makes every delta a
  * measured, non-negative quantity by construction, and the main()
  * asserts that before writing the artifact.
  *
  * Each stage body is run 3x (min taken): run 1 pays Janino codegen
  * compilation + JIT for that stage's kernels, runs 2-3 are warm.
  * Checkpoints created inside a timed run are unpersisted after it so
  * repeated runs neither reuse nor accumulate blocks. The pipelines'
  * own end-to-end cost is measured separately (the real SparkEntry
  * query, scan to final count) and emitted as `full_sec` alongside the
  * stage list — full_sec ~ sum(marginals) is the cross-check, not an
  * identity (materialized inputs remove the re-scan each live lineage
  * pays).
  *
  * Writes `PROFILE_E2E.json` so [[ScaleCurve]] renders the committed
  * stage tables from measured data. Run:
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

    val sc = spark.sparkContext
    // Materialize a stage input OUTSIDE any timed window. MEMORY_AND_DISK
    // (localCheckpoint's default level) spills corpus-sized frames rather
    // than OOMing the 16g default driver heap.
    def mat(df: DataFrame): DataFrame = df.localCheckpoint(true)
    def drop(df: DataFrame): Unit = df.unpersist(true)

    def timeBody(label: String)(build: => DataFrame): (Double, Long) = {
      def once(): (Double, Long) = {
        val before = sc.getPersistentRDDs.keySet
        System.gc()
        val t0 = System.nanoTime()
        // the build is INSIDE the timed window: eager checkpoints inside
        // a stage body (prepare's boundary, chunk_dedup's) do their work
        // at construction, not at count()
        val n = TimingSink.rows(build)
        val sec = (System.nanoTime() - t0) / 1e9
        // sweep blocks the run itself created, keep the materialized inputs
        sc.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!before(id)) rdd.unpersist(true)
        }
        (sec, n)
      }
      val runs = Seq(once(), once(), once())
      val (sec, n) = (runs.map(_._1).min, runs.last._2)
      System.err.println(f"[e2e-stage] $label%-22s $sec%8.2f s  rows=$n")
      (sec, n)
    }

    val mix = Map("en" -> 0.4, "zh" -> 0.2, "es" -> 0.15, "de" -> 0.15,
      "fr" -> 0.1)

    // ---- e2e_corpus_assembly: scan -> exact dedup -> near dedup ->
    //      quality/analysis boundary -> mixture -> chunks ----
    val assemblyStages = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Long)]
    def stageA(label: String)(build: => DataFrame): Unit =
      assemblyStages += { val (s, n) = timeBody(label)(build); (label, s, n) }

    def docs = Tables.documents(spark, dir)
    stageA("scan")(docs)
    val docsM = mat(docs)
    stageA("exact_dedup")(CorpusPipeline.dropExactDups(docsM, "doc_id", "text"))
    val exactM = mat(CorpusPipeline.dropExactDups(docsM, "doc_id", "text"))
    stageA("near_dedup")(CorpusPipeline.dropNearDups(exactM, "doc_id",
      "text", 3, 6, 3, 0.7))
    val nearM = mat(CorpusPipeline.dropNearDups(exactM, "doc_id", "text",
      3, 6, 3, 0.7))
    drop(exactM)
    // prepare's analyze + the stage-boundary checkpoint write, as the
    // composition pays it (the checkpoint executes inside the window)
    stageA("prepare(analyze)")(
      CorpusPipeline.analyze(nearM, "text", 30.0).localCheckpoint(true))
    val preparedM = mat(CorpusPipeline.analyze(nearM, "text", 30.0))
    drop(nearM)
    stageA("mixture")(TextAnalysis.mixtureSample(preparedM, "doc_id",
      "text", "lang", mix, 0.5))
    val mixKeysM = mat(TextAnalysis.mixtureSample(preparedM, "doc_id",
      "text", "lang", mix, 0.5).select(col("doc_id")))
    stageA("chunks") {
      val sampled = preparedM.join(mixKeysM, Seq("doc_id"), "left_semi")
      TextAnalysis.chunkDocuments(sampled, "doc_id", "text", 30, 5)
    }
    drop(mixKeysM); drop(preparedM)
    val (fullAssembly, _) = timeBody("full_e2e(real query)")(
      graft.SparkEntry.queries("e2e_corpus_assembly")(spark, dir))

    // ---- e2e_llm_prep: Gopher rule gate -> exact-substring chunk dedup
    //      -> DSIR target selection ----
    val prepStages = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Long)]
    def stageP(label: String)(build: => DataFrame): Unit =
      prepStages += { val (s, n) = timeBody(label)(build); (label, s, n) }

    stageP("gopher_gate")(
      TextAnalysis.gopherStructuralFilter(docsM, "text"))
    val gatedM = mat(TextAnalysis.gopherStructuralFilter(docsM, "text"))
    drop(docsM)
    // stage body mirrors the query in TextQueries.scala exactly,
    // including the composition's own checkpoint boundary
    stageP("chunk_dedup") {
      Dedup.chunkDedup(gatedM, "doc_id", "text", 3)
        .select(col("doc_id"), col("dedup_text"))
        .join(gatedM.select("doc_id", "source"), "doc_id")
        .localCheckpoint(true)
    }
    val dedupBaseM = mat(
      Dedup.chunkDedup(gatedM, "doc_id", "text", 3)
        .select(col("doc_id"), col("dedup_text"))
        .join(gatedM.select("doc_id", "source"), "doc_id"))
    drop(gatedM)
    stageP("dsir_select") {
      val weights = TextAnalysis.dsirWeightsByPred(dedupBaseM,
        col("source").isin("src1", "src2", "src3", "src4"), "doc_id",
        "dedup_text", 256)
      dedupBaseM.join(weights.filter(col("log_w") > 0).select("doc_id"),
        "doc_id")
    }
    drop(dedupBaseM)
    val (fullPrep, _) = timeBody("full_llm_prep(real query)")(
      graft.SparkEntry.queries("e2e_llm_prep")(spark, dir))

    // ---- e2e_c4_prep: word-wrap segmentation + C4 gate/line-clean ->
    //      chunk dedup over cleaned text -> BPE pricing per source ----
    val c4Stages = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Long)]
    def stageC(label: String)(build: => DataFrame): Unit =
      c4Stages += { val (s, n) = timeBody(label)(build); (label, s, n) }

    import graft.queries.TextQueries
    stageC("segment+c4_clean")(TextAnalysis.c4StructuralClean(
      TextQueries.c4SegmentedDocs(spark, dir), "text"))
    val cleanedM = mat(TextAnalysis.c4StructuralClean(
      TextQueries.c4SegmentedDocs(spark, dir), "text"))
    stageC("chunk_dedup") {
      Dedup.chunkDedup(cleanedM, "doc_id", "clean_text", 3)
        .select(col("doc_id"), col("dedup_text"))
        .join(cleanedM.select("doc_id", "source"), "doc_id")
        .localCheckpoint(true)
    }
    val c4BaseM = mat(
      Dedup.chunkDedup(cleanedM, "doc_id", "clean_text", 3)
        .select(col("doc_id"), col("dedup_text"))
        .join(cleanedM.select("doc_id", "source"), "doc_id"))
    drop(cleanedM)
    stageC("bpe_pricing") {
      TextAnalysis.bpeTokenCounts(c4BaseM, "doc_id", "dedup_text")
        .join(c4BaseM.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(col("n_subwords")).as("total_subwords"),
          round(avg(col("chars_per_subword")), 6).as("mean_cps"))
    }
    drop(c4BaseM)
    val (fullC4, _) = timeBody("full_c4_prep(real query)")(
      graft.SparkEntry.queries("e2e_c4_prep")(spark, dir))

    // ---- e2e_decontam_prep: Gopher gate -> stride-1 ExactSubstr cut ->
    //      PII span redaction (dd28) -> eval decontamination -> BPE
    //      pricing ----
    val deconStages = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Long)]
    def stageD(label: String)(build: => DataFrame): Unit =
      deconStages += { val (s, n) = timeBody(label)(build); (label, s, n) }

    val evalM = mat(docs.filter(col("doc_id") < 20)
      .select(col("doc_id"), col("text").as("redacted_text")))
    stageD("gopher_gate")(TextAnalysis.gopherStructuralFilter(
      docs.filter(col("doc_id") >= 20), "text"))
    // trainM carries the query's PII planting (a map-only projection;
    // its cost rides the untimed materialization, the full-query row
    // measures everything)
    val trainM = mat(graft.queries.TextQueries.plantPii(
      TextAnalysis.gopherStructuralFilter(
        docs.filter(col("doc_id") >= 20), "text")))
    // stage body mirrors the query, including its checkpoint boundary
    stageD("substr_cut") {
      Dedup.substrCut(trainM, "doc_id", "text", 4)
        .select(col("doc_id"), col("dedup_text"))
        .join(trainM.select("doc_id", "source"), "doc_id")
        .localCheckpoint(true)
    }
    val cutM = mat(Dedup.substrCut(trainM, "doc_id", "text", 4)
      .select(col("doc_id"), col("dedup_text"))
      .join(trainM.select("doc_id", "source"), "doc_id"))
    drop(trainM)
    stageD("pii_redact") {
      Dedup.piiRedactCut(cutM.select(col("doc_id"), col("dedup_text")),
          "doc_id", "dedup_text")
        .select(col("doc_id"), col("n_pii_spans"), col("redacted_text"))
        .localCheckpoint(true)
    }
    val redM = mat(Dedup.piiRedactCut(
        cutM.select(col("doc_id"), col("dedup_text")), "doc_id", "dedup_text")
      .select(col("doc_id"), col("n_pii_spans"), col("redacted_text")))
    stageD("decontam_cut")(Dedup.decontamCut(
      redM.select(col("doc_id"), col("redacted_text")), evalM,
      "doc_id", "redacted_text", 4))
    val deconM = mat(Dedup.decontamCut(
      redM.select(col("doc_id"), col("redacted_text")), evalM,
      "doc_id", "redacted_text", 4))
    drop(evalM)
    stageD("bpe_pricing") {
      TextAnalysis.bpeTokenCounts(
          deconM.select(col("doc_id"), col("dedup_text")),
          "doc_id", "dedup_text")
        .join(deconM.select(col("doc_id"), col("tokens_cut")), "doc_id")
        .join(redM.select(col("doc_id"), col("n_pii_spans")), "doc_id")
        .join(cutM.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(col("n_subwords")).as("total_subwords"),
          round(avg(col("chars_per_subword")), 6).as("mean_cps"),
          sum(col("tokens_cut")).as("decontam_tokens_cut"),
          sum(col("n_pii_spans")).as("pii_spans_redacted"))
    }
    drop(deconM); drop(cutM); drop(redM)
    val (fullDecon, _) = timeBody("full_decontam(real query)")(
      graft.SparkEntry.queries("e2e_decontam_prep")(spark, dir))

    // the artifact's contract: every delta is a directly-measured
    // marginal cost, so it cannot be negative — assert before writing
    (assemblyStages ++ prepStages ++ c4Stages ++ deconStages).foreach {
      case (label, sec, _) =>
        require(sec >= 0.0, s"stage $label measured negative: $sec")
    }
    def stageJson(rs: Seq[(String, Double, Long)]): String = {
      var cum = 0.0
      rs.map { case (label, sec, n) =>
        cum += sec
        f"""{"stage":"$label","cumulative_sec":$cum%.2f,"delta_sec":$sec%.2f,"rows":$n}"""
      }.mkString("[", ",", "]")
    }
    val pipelines =
      f"""[{"name":"e2e_corpus_assembly","full_sec":$fullAssembly%.2f,"stages":${stageJson(assemblyStages.toSeq)}},""" +
      f"""{"name":"e2e_llm_prep","full_sec":$fullPrep%.2f,"stages":${stageJson(prepStages.toSeq)}},""" +
      f"""{"name":"e2e_c4_prep","full_sec":$fullC4%.2f,"stages":${stageJson(c4Stages.toSeq)}},""" +
      f"""{"name":"e2e_decontam_prep","full_sec":$fullDecon%.2f,"stages":${stageJson(deconStages.toSeq)}}]"""
    val json = s"""{"dir":"$dir","cpus":$cpus,"timing":"marginal-min3","pipelines":$pipelines}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PROFILE_E2E.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
