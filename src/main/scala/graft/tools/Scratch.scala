package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch runner: `sbt "runMain graft.tools.Scratch <query> <sfDir>"`
  * runs one SparkEntry query with a full stack trace — the fast loop for
  * diagnosing a single failing query outside Verify's catch-all. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("a13_pbsi")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.show(10, truncate = false)
    df.explain("formatted")
    spark.stop()
  }
}
