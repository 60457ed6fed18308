package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Hashing
import graft.operators.Dedup

/** Dev perf probe: time individual fragments of the heavy dedup queries. */
object Perf {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    time("docs.count")(docs.count())
    val withSets = docs.select(
      col("source"), col("doc_id"),
      array_sort(array_distinct(transform(Dedup.shingles(col("text"), 2),
        s => Hashing.sha28(s)))).as("sh"))
    time("withSets.count")(withSets.count())
    time("withSets x2")(withSets.union(withSets).count())
    val l = withSets.as("l")
    val r = withSets.as("r")
    val pairs = l.join(r, col("l.source") === col("r.source") &&
      col("l.doc_id") < col("r.doc_id"))
    time("pairs.count")(pairs.count())
    time("sizes.agg")(pairs.select((size(col("l.sh")) + size(col("r.sh"))).as("i"))
      .agg(sum("i")).collect())
    val withInter = pairs.select(
      graft.functions.SortedLongIntersectCount(col("l.sh"), col("r.sh")).as("i"))
    time("inter.agg")(withInter.agg(sum("i")).collect())
    withInter.agg(sum("i")).explain("simple")
    val dd5 = graft.queries.TextQueries.queries("dd5_ngram_jaccard")(spark, dir)
    time("dd5 full")(dd5.count())
    println("[perf] dd5 FINAL plan:")
    println(dd5.queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("WholeStageCodegen") || l.contains("Join") ||
        l.contains("Exchange") || l.contains("Project") || l.contains("Scan") ||
        l.contains("Filter")).mkString("\n"))
    println("[perf] dd5 codegen: " + dd5.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("*(")) + " codegen'd nodes")
    val cg = spark.sessionState.conf.getConfString("spark.sql.codegen.wholeStage")
    println(s"[perf] wholeStage codegen conf: $cg")
    time("dd3 full")(graft.queries.TextQueries.queries("dd3_lsh_candidates")(spark, dir).count())
    spark.stop()
  }
}
