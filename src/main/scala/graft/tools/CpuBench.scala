package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time queries by PROCESS CPU as well as wall clock. This
  * sandbox's wall clock swings 2-3x with host weather (documented in
  * OPTIMIZATION_r13.md's baseline note), which drowns per-task kernel
  * changes in scheduling noise; the JVM's process-CPU counter sums the
  * actual cycles our tasks burned and is nearly contention-independent,
  * so it is the honest before/after currency for a CPU-bound kernel
  * change (a wall-only win could be weather; a CPU win is real work
  * removed). Wall is still printed — a CPU win that does not move
  * quiet-window wall time is overlap, not savings.
  *
  * usage: runMain graft.tools.CpuBench <sfDir> <q1,q2,...> [runs]
  */
object CpuBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CpuBench <sfDir> <q1,q2,...> [runs]")
    val dir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      var bestWall = Double.MaxValue
      var bestCpu = Double.MaxValue
      (0 to runs).foreach { r => // run 0 = warmup (codegen/JIT), untimed
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        val c0 = os.getProcessCpuTime
        val t0 = System.nanoTime()
        TimingSink.rows(fn(spark, dir))
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (os.getProcessCpuTime - c0) / 1e9
        if (r > 0) {
          bestWall = math.min(bestWall, wall)
          bestCpu = math.min(bestCpu, cpu)
        }
      }
      println(f"[cpu-bench] $name%-28s wall=$bestWall%7.2f s  cpu=$bestCpu%8.2f s")
    }
    spark.stop()
  }
}
