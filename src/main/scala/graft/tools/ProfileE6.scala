package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for `e6_session_paths`' third-decade ratio (SCALING.md's
  * one unannotated super-sibling row: 5.9 on 10x events where
  * w4/j12/j13 sit at 2.3–3.3). Times the operator's internal stages
  * cumulatively at both event scales (2M sf10g / 20M sf100ge), min of
  * 2, through TimingSink — so the delta between stages names WHERE the
  * extra decade cost lives: the user-window sessionization (shared
  * with w4), the second per-(user, session) sort + row_number, the
  * truncated struct collect, or the final path-string aggregation.
  * Findings land in SCALING.md's event-family note (ScaleCurve renders
  * it) — this probe is how to re-measure them.
  *
  * Run AFTER the fixtures exist (ScaleCurve/DeepDocsProbe generate
  * them): `sbt "runMain graft.tools.ProfileE6"`. */
object ProfileE6 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_scale/sf10g", "/tmp/graft_scale/sf100ge")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    def stages(dir: String): Seq[(String, () => org.apache.spark.sql.DataFrame)] = {
      def ev = graft.core.Tables.events(spark, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      def sess = ev
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("brk", when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1)
          .otherwise(0))
        .withColumn("sess", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      val wSess = Window.partitionBy(col("user_id"), col("sess"))
        .orderBy(col("ts"), col("event_id"), col("event_type"))
      def ranked = sess.withColumn("rk", row_number().over(wSess))
      def perSession = ranked
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("n_events"),
          concat_ws(">", (1 to 8).map(i =>
            max(when(col("rk") === i, col("event_type")))): _*).as("path"))
      Seq(
        "1_scan" -> (() => ev),
        "2_sessionize(window1)" -> (() => sess),
        "3_rank(window2)" -> (() => ranked),
        "4_per_session_collect" -> (() => perSession),
        "5_full(path agg)" -> (() => graft.SparkEntry
          .queries("e6_session_paths")(spark, dir)))
    }
    dirs.foreach { dir =>
      graft.core.Tables.events(spark, dir).count() // footer warm-up
      stages(dir).foreach { case (name, mk) =>
        val t = Seq.fill(2)({
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val n = TimingSink.rows(mk())
          ((System.nanoTime() - t0) / 1e9, n)
        }).minBy(_._1)
        System.err.println(f"[e6-profile] $dir%-28s $name%-24s ${t._1}%7.2f s rows=${t._2}")
      }
    }
    spark.stop()
  }
}
