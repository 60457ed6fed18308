package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: split a query's wall time into CONSTRUCTION (the
  * `fn(spark, dir)` call — where eager localCheckpoints, driver-side
  * fits and collect-based constants run) and SINK (executing the
  * returned frame's own plan through [[TimingSink]]). Where a query's
  * seconds live decides which optimization applies: construction time
  * is driver-action count / materialization cost, sink time is the
  * final plan.
  *
  * usage: runMain graft.tools.ProfilePhases <sfDir> <q1,q2,...> [runs]
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfilePhases <sfDir> <q1,q2,...> [runs]")
    val dir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      var bestC = Double.MaxValue
      var bestS = Double.MaxValue
      (1 to runs).foreach { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        TimingSink.rows(df)
        val t2 = System.nanoTime()
        bestC = math.min(bestC, (t1 - t0) / 1e9)
        bestS = math.min(bestS, (t2 - t1) / 1e9)
      }
      println(f"[phases] $name%-28s construct=$bestC%6.2f s  sink=$bestS%6.2f s")
    }
    spark.stop()
  }
}
