package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level wall-clock profile of the e2e_corpus_assembly composition
  * (dev tool): times each pipeline stage CUMULATIVELY (count() from the
  * raw scan through stage k) at one scale dir, so a superlinear stage
  * shows up as the step where cumulative time jumps. Run:
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
    import graft.operators.TextAnalysis
    import graft.core.Tables

    def time(label: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      val t0 = System.nanoTime()
      val n = df.count()
      System.err.println(
        f"[e2e-stage] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, dir)
    val mix = Map("en" -> 0.4, "zh" -> 0.2, "es" -> 0.15, "de" -> 0.15,
      "fr" -> 0.1)
    time("scan")(docs)
    time("exact_dedup")(CorpusPipeline.dropExactDups(docs, "doc_id", "text"))
    val afterExact = CorpusPipeline.dropExactDups(docs, "doc_id", "text")
    time("near_dedup")(CorpusPipeline.dropNearDups(afterExact, "doc_id",
      "text", 3, 6, 3, 0.7))
    val prepared = CorpusPipeline.prepare(docs, "doc_id", "text")
    time("prepare(analyze)")(prepared)
    time("mixture")(TextAnalysis.mixtureSample(prepared, "doc_id", "text",
      "lang", mix, 0.5))
    val mixKeys = TextAnalysis.mixtureSample(prepared, "doc_id", "text",
        "lang", mix, 0.5).select(col("doc_id"), col("lang"))
    val sampled = prepared.join(mixKeys.select("doc_id"), Seq("doc_id"),
      "left_semi")
    time("chunks")(TextAnalysis.chunkDocuments(sampled, "doc_id", "text", 30, 5))
    time("full_e2e")(graft.SparkEntry.queries("e2e_corpus_assembly")(spark, dir))
    spark.stop()
  }
}
