package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Dev probe: break the corpus-analysis stage's materialized cost into
  * its component column families at one scale dir (min of 2 per probe).
  * The `forced` variants evaluate columns through an aggregate (a bare
  * count() lets Spark prune computed columns away); the `+ ckpt`
  * variants measure what a stage boundary actually pays. The
  * "punct regex only" row keeps the COMPOSABLE regexp_replace form on
  * purpose — it is the recorded contrast that motivated
  * [[graft.functions.PunctCharCount]] (~15 s vs sub-second over 500k
  * docs at sf10g). */
object ProbeAnalyze {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/sf10g")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir)
    docs.count()
    def t(label: String)(df: => DataFrame): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      def once(): Double = {
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      val m = math.min(once(), once())
      System.err.println(f"[probe-analyze] $label%-26s $m%8.2f s")
    }
    // force evaluation of every column through an aggregate (a bare
    // count() lets Spark prune the computed columns away)
    def forced(df: DataFrame): DataFrame =
      df.agg(sum(xxhash64(struct(df.columns.map(col): _*))))
    t("baseline forced")(forced(docs))
    t("qualityColumns forced")(forced(TextAnalysis.qualityColumns(docs, "text")))
    t("tokenCounts forced")(forced(TextAnalysis.tokenCounts(docs, "text")))
    t("langId forced")(forced(docs.withColumn("l", TextAnalysis.langId(col("text")))))
    t("fingerprint forced")(forced(docs.withColumn("f", TextAnalysis.fingerprint(col("text")))))
    def allCols = TextAnalysis.tokenCounts(
        TextAnalysis.qualityColumns(docs, "text"), "text")
      .withColumn("pred_lang", TextAnalysis.langId(col("text")))
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    t("all columns forced")(forced(allCols))
    t("all + filter + checkpoint")(
      allCols.filter(col("quality_score") >= 30.0).localCheckpoint(true))
    t("docs + checkpoint only")(docs.localCheckpoint(true))
    t("all + checkpoint (no filter)")(allCols.localCheckpoint(true))
    t("all + filter forced")(forced(allCols.filter(col("quality_score") >= 30.0)))
    t("docs + filter(len) + ckpt")(
      docs.filter(length(col("text")) > 0).localCheckpoint(true))
    t("quality only + ckpt")(
      TextAnalysis.qualityColumns(docs, "text").localCheckpoint(true))
    t("langId only + ckpt")(
      docs.withColumn("l", TextAnalysis.langId(col("text"))).localCheckpoint(true))
    t("fingerprint only + ckpt")(
      docs.withColumn("f", TextAnalysis.fingerprint(col("text"))).localCheckpoint(true))
    t("tokenCounts only + ckpt")(
      TextAnalysis.tokenCounts(docs, "text").localCheckpoint(true))
    t("quality + repart(32) + ckpt")(
      TextAnalysis.qualityColumns(
        docs.repartition(spark.sparkContext.defaultParallelism), "text")
        .localCheckpoint(true))
    t("stops col only + ckpt")(docs.withColumn("s",
      graft.functions.TokenSetHits(col("text"), TextAnalysis.qualityStopwords))
      .localCheckpoint(true))
    t("punct regex only + ckpt")(docs.withColumn("p",
      length(col("text")) - length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", "")))
      .localCheckpoint(true))
    t("split size only + ckpt")(docs.withColumn("w",
      size(split(lower(col("text")), "\\s+"))).localCheckpoint(true))
    spark.stop()
  }
}
