package graft.core

import org.apache.spark.sql.SparkSession

/** Session builder with the engine's recommended local-mode settings
  * (SURVEY §7.1 core/). UTC session time zone is load-bearing: the oracle
  * compares date/hour extractions against DuckDB's naive timestamps. */
object Sessions {
  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
