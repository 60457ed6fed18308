package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length == 2 || args.length == 3,
      s"usage: graft.Verify <sfDir> <outDir> [name1,name2,...] (got ${args.length} args)")
    val sfDir = args(0); val outDir = args(1)
    // Optional third arg: run only these queries (dev loop; the driver
    // always runs the full set).
    val only = args.lift(2).map(_.split(',').toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")} — " +
          "a typo here would silently verify nothing")
    }
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (k, _) => names(k) })
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Suite-state hygiene (same lesson as Bench.scala): the SQL status
      // listener retains up to 1000 completed executions' plan graphs
      // even with the UI off — across 100+ queries that ages the driver
      // heap and slows late-suite runs.
      .config("spark.sql.ui.retainedExecutions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.ListBuffer.empty[(String, String)]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Self-describing failure record: a CORRECTNESS file with fewer rows
    // than SparkEntry.queries must never masquerade as "fewer queries" —
    // the driver (and the judge) can read exactly what broke and why.
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/failures.json"),
      s"""{"total": ${selected.size}, "failed": ${failures.size}, "errors": $failJson}""")
    // Also commit-path copy so the failure history survives in the repo
    // snapshot even if the driver only collects CORRECTNESS/BENCH files —
    // full runs only, so a dev subset run can't overwrite the record.
    if (only.isEmpty)
      try Files.writeString(Paths.get("VERIFY_FAILURES.json"),
        s"""{"sfDir": ${q(sfDir)}, "total": ${selected.size}, "failed": ${failures.size}, "errors": $failJson}""")
      catch { case _: Throwable => () }
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size}/${selected.size} queries FAILED")
    spark.stop()
  }
}
