package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.ReferencePipeline

/** Dev harness: run a reference-contract operator on a fixture CSV and
  * dump a single CSV for tools/reference_parity.py to diff against the
  * ACTUAL reference implementation's output on the same fixture.
  * Usage: runMain graft.tools.ParityDump <meds|pbsi> <inCsv> <outCsv> [snapshot]
  */
object ParityDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ParityDump <meds|pbsi> <in> <out> [snapshot]")
    val Array(task, in, out) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = task match {
      case "meds" =>
        val csv = spark.read.option("header", "true").csv(in)
        ReferencePipeline.medsDaily(csv, args(3))
      case "pbsi" =>
        val csv = spark.read.option("header", "true")
          .option("inferSchema", "true").option("nullValue", "").csv(in)
        ReferencePipeline.pbsiFromUnified(csv)
          .select("date", "sleep_sub", "cardio_sub", "activity_sub",
            "pbsi_score", "label_3cls", "label_2cls", "pbsi_quality")
      case "som" =>
        val csv = spark.read.option("header", "true").csv(in)
        ReferencePipeline.somDaily(csv,
          if (args.length > 3) Some(args(3)) else None)
    }
    graft.core.Sinks.atomicCsv(df, out)
    spark.stop()
  }
}
