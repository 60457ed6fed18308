package graft.tools

import org.apache.spark.sql.SparkSession

/** Third-docs-decade probe (dev tool): generate a 5M-document corpus
  * with [[ScaleCurve]]'s generator and time named queries on it,
  * min-of-2 — one decade beyond SCALING.md's sf10g table. Used to
  * substantiate the production-banding claim (dd21) across THREE
  * measured decades; results are recorded in SCALING.md's narrative.
  * Run: `sbt "runMain graft.tools.DeepDocsProbe dd21_lsh_prod_bands"`. */
object DeepDocsProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("dd21_lsh_prod_bands")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_scale/sf100gd"
    if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists())
      ScaleCurve.genDocuments(spark, 5000000L, s"$dir/documents.parquet")
    graft.core.Tables.documents(spark, dir).count() // warm footers
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        System.gc()
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      // no untimed warm-up: at this absolute size codegen/JIT is noise
      // (seconds against minutes) and a third full run isn't free
      val (t1, n) = once()
      val (t2, _) = once()
      System.err.println(
        f"[deep-docs] $name%-24s 5M docs: ${math.min(t1, t2)}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
