package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round plan capture: write `.explain("formatted")` for the
  * named queries to `<outDir>/<query>_<tag>.txt`, one file per query —
  * the before/after evidence files the optimization judge reads
  * (plans/r13/...). Uses the bench's session shape (cpus/shuffle
  * partitions from SPARK_GRAFT_CPUS) so the captured plan is the plan
  * the bench actually times.
  *
  * usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: ExplainDump <sfDir> <outDir> <tag> <q1,q2,...>")
    val Array(sfDir, outDir, tag, namesCsv) = args
    val names = namesCsv.split(',').map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
      System.err.println(s"[explain] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
