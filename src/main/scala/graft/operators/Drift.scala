package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon.round

/** Drift / distribution-shift operators (SURVEY §2.10 D1-D3).
  *
  * D2 (KS two-sample) is pure relational math — the KS statistic is the
  * max gap between two empirical CDFs, computable with rank windows.
  * D1 (ADWIN) is inherently sequential state over an ordered series; the
  * daily series it runs on is tiny by construction (years of days), so a
  * sorted single-partition `mapPartitions` is the honest Spark mapping
  * (SURVEY §2.12) — the surrounding pipeline stays distributed.
  */
object Drift {

  /** D2 — Kolmogorov-Smirnov two-sample statistic per group: for each
    * `groupCol` value, the max |CDF_a - CDF_b| between the values of the
    * two samples identified by `sampleCol` in {a, b}.
    *
    * Window formulation: sort the combined sample per group; at each
    * point, CDF_s = (#s-values <= x) / n_s; KS = max over points. Ties
    * are handled by evaluating the CDF AFTER all duplicates of a value
    * (cume_dist semantics), matching the textbook statistic. */
  def ksTwoSample(df: DataFrame, groupCol: String, sampleCol: String,
                  valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col(groupCol))
    // count duplicates: process via value-level aggregation first so each
    // distinct value appears once with per-sample counts.
    val perValue = df
      .groupBy(col(groupCol), col(valueCol))
      .agg(
        sum(when(col(sampleCol) === "a", 1).otherwise(0)).as("ca"),
        sum(when(col(sampleCol) === "b", 1).otherwise(0)).as("cb"))
    perValue
      .withColumn("cum_a", sum("ca").over(w))
      .withColumn("cum_b", sum("cb").over(w))
      .withColumn("n_a", sum("ca").over(wAll))
      .withColumn("n_b", sum("cb").over(wAll))
      .withColumn("gap",
        abs(col("cum_a") / col("n_a") - col("cum_b") / col("n_b")))
      .groupBy(col(groupCol))
      .agg(round(max("gap"), 6).as("ks_stat"),
        max("n_a").as("n_a"), max("n_b").as("n_b"))
  }

  /** D1 — ADWIN-style adaptive-window change detection (δ-bounded mean
    * shift) over a date-ordered series, one state machine per key.
    *
    * Simplified deterministic variant of Bifet & Gavaldà's ADWIN: keep a
    * growing window of recent values; at each step test every split of
    * the window buffer — if |mean_left - mean_right| exceeds the Hoeffding
    * cut `eps = sqrt((1/(2m)) * ln(4/delta))` with m the harmonic mean of
    * the split sizes, drop the left side and emit a change point.
    * Emits (key, order, value, is_change). */
  def adwin(df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
            delta: Double): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    val outSchema = new org.apache.spark.sql.types.StructType()
      .add(df.schema(keyCol))
      .add(df.schema(orderCol))
      .add(df.schema(valueCol).copy(name = "value"))
      .add("is_change", org.apache.spark.sql.types.IntegerType)
    val sorted = df
      .select(col(keyCol), col(orderCol), col(valueCol))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(orderCol))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    sorted.mapPartitions { rows =>
      var curKey: Any = null
      val window = scala.collection.mutable.ArrayBuffer.empty[Double]
      rows.map { r =>
        val k = r.get(0)
        if (k != curKey) { curKey = k; window.clear() }
        val v = r.getDouble(2)
        window += v
        var change = 0
        var dropTo = 0
        // test splits from oldest: first split that trips wins
        var i = 1
        while (i < window.length && change == 0) {
          val left = window.view.slice(0, i)
          val right = window.view.slice(i, window.length)
          val n0 = left.size.toDouble
          val n1 = right.size.toDouble
          val m = 1.0 / (1.0 / n0 + 1.0 / n1)
          val eps = math.sqrt(1.0 / (2 * m) * math.log(4.0 / delta))
          if (math.abs(left.sum / n0 - right.sum / n1) > eps) {
            change = 1; dropTo = i
          }
          i += 1
        }
        if (change == 1) window.remove(0, dropTo)
        Row(k, r.get(1), v, change)
      }
    }
  }
}
