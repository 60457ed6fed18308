package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for `m6_model_families` — the bench's standing top cost
  * since round 10. Times each (family x fold) MLlib fit SEPARATELY
  * (sequentially, min of 2, over the same 1-partition checkpointed fold
  * frames the query uses) and the query's live concurrent form, so the
  * breakdown names where the wall time lives: which family, and how
  * much the fit overlap already buys. Findings are recorded in the
  * query's scaladoc (`queries/MlQueries.scala`) — this probe is how to
  * re-measure them.
  *
  * Run: `sbt "runMain graft.tools.ProfileM6 [sfDir]"`. */
object ProfileM6 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ml.Models
    val daily = graft.queries.MlQueries.dailyUserFrame(spark, dir)
      .withColumn("label",
        when(col("f_mean") >= 105, 2.0).when(col("f_mean") <= 95, 0.0)
          .otherwise(1.0))
      .repartition(1).sortWithinPartitions("user_id", "date")
      .localCheckpoint(true)
    val feats = Seq("f_mean", "f_n", "f_purchase")
    val folds = Seq((0, "2024-01-15", "2024-01-22"),
      (1, "2024-01-22", "2024-02-01"))
    val foldFrames = folds.map { case (fid, vs, ve) =>
      (fid,
        daily.filter(col("date") < lit(vs).cast("date")).localCheckpoint(true),
        daily.filter(col("date") >= lit(vs).cast("date") &&
          col("date") < lit(ve).cast("date")).localCheckpoint(true))
    }
    val families: Seq[(String, (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)] =
      Seq(
        "logreg" -> ((tr, va) => Models.logisticRegression(tr, va, feats,
          "label", maxIter = 25)),
        "rf" -> ((tr, va) => Models.randomForest(tr, va, feats, "label",
          numTrees = 10, maxDepth = 4)),
        "gbt" -> ((tr, va) => Models.gbt(tr, va, feats, "label",
          maxIter = 5, maxDepth = 3)),
        "svc" -> ((tr, va) => Models.linearSvc(tr, va, feats, "label",
          maxIter = 10)))
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warm-up: one full fit per family absorbs codegen/JIT
    families.foreach { case (_, fit) =>
      val (_, tr, va) = foldFrames.head
      fit(tr, va).queryExecution.toRdd.count()
    }
    System.err.println("[m6-profile] per-(family, fold) SEQUENTIAL fit+transform (min of 2):")
    var seqTotal = 0.0
    families.foreach { case (name, fit) =>
      foldFrames.foreach { case (fid, tr, va) =>
        val t = Seq.fill(2)(time {
          fit(tr, va).queryExecution.toRdd.count()
        }).min
        seqTotal += t
        System.err.println(f"[m6-profile]   $name%-7s fold $fid%d: $t%6.2f s")
      }
    }
    System.err.println(f"[m6-profile] sequential total: $seqTotal%6.2f s")
    // the query's live concurrent form
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val tConc = Seq.fill(2)(time {
      Await.result(Future.sequence(for {
        (fid, tr, va) <- foldFrames
        (_, fit) <- families
      } yield Future { fit(tr, va).queryExecution.toRdd.count() }),
        Duration.Inf)
    }).min
    System.err.println(f"[m6-profile] concurrent 8-fit wall: $tConc%6.2f s " +
      f"(overlap buys x${seqTotal / tConc}%.1f)")
    val tFull = Seq.fill(2)(time {
      TimingSink.rows(graft.SparkEntry.queries("m6_model_families")(spark, dir))
    }).min
    System.err.println(f"[m6-profile] full m6 query (incl. daily frame + metrics): $tFull%6.2f s")
    spark.stop()
  }
}
