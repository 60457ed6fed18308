package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Full-directory regeneration drill: rewrite EVERY sf0.001 table into a
  * tmp testdata directory with the compatible encoding drifts a driver
  * regeneration has produced or plausibly could — events.ts back to the
  * rounds-1-4 nanos-as-long shape, narrowed/widened integer keys, double
  * embedding elements — then run one representative query per table
  * family against BOTH directories and require identical results.
  *
  * LoadersSpec pins the per-table conform mechanics; this is the
  * integration half: the drift never reaches query semantics. (Round 5
  * lost 67 of 109 queries to exactly such a regeneration.)
  */
class DriftedTestdataSpec extends SparkTestBase {

  private val srcDir = "/root/testdata/sf0.001"

  /** Queries covering every drifted table: events aggregation + window,
    * lineitem/orders/customer/nation joins + aggregation, documents
    * hashing, embeddings LSH ANN. */
  private val probes = Seq("a2_daily_stats", "w1_rolling_mean",
    "q1_pricing_summary", "q5_region_revenue", "j_anti_customers",
    "dd1_exact_dedup", "t2_quality", "sim2_ann_lsh", "sim4_quantize")

  private def writeDrifted(spark: SparkSession): String = {
    val dir = Files.createTempDirectory("drifted-testdata").toString
    def rewrite(name: String)(f: DataFrame => DataFrame): Unit =
      f(graft.core.Tables.load(spark, srcDir, name))
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    // events: the rounds-1-4 encoding — ts as a long of ns since epoch
    // (what TIMESTAMP(NANOS) decodes to under nanosAsLong)
    rewrite("events")(df => df.withColumn("ts",
      (unix_micros(col("ts").cast(TimestampType)) * 1000L).as("ts")))
    // integral drift both directions (values at sf0.001 fit in int)
    rewrite("lineitem")(df => df
      .withColumn("l_orderkey", col("l_orderkey").cast(IntegerType))
      .withColumn("l_linenumber", col("l_linenumber").cast(LongType)))
    rewrite("orders")(df => df
      .withColumn("o_orderkey", col("o_orderkey").cast(IntegerType)))
    rewrite("customer")(df => df
      .withColumn("c_custkey", col("c_custkey").cast(IntegerType))
      .withColumn("c_nationkey", col("c_nationkey").cast(LongType)))
    rewrite("nation")(df => df
      .withColumn("n_nationkey", col("n_nationkey").cast(LongType)))
    rewrite("region")(df => df
      .withColumn("r_regionkey", col("r_regionkey").cast(LongType)))
    rewrite("supplier")(identity)
    rewrite("part")(identity)
    rewrite("documents")(df => df
      .withColumn("doc_id", col("doc_id").cast(IntegerType))
      .withColumn("n_chars", col("n_chars").cast(IntegerType)))
    rewrite("embeddings")(df => df
      .withColumn("vec_id", col("vec_id").cast(IntegerType))
      .withColumn("embedding",
        transform(col("embedding"), e => e.cast(DoubleType)))
      .withColumn("label", col("label").cast(LongType)))
    dir
  }

  test("representative queries are encoding-invariant across a drifted regeneration") {
    val drifted = writeDrifted(spark)
    for (name <- probes) {
      val fn = SparkEntry.queries(name)
      val want = fn(spark, srcDir)
      val got = fn(spark, drifted)
      assert(got.schema.map(f => (f.name, f.dataType)) ===
        want.schema.map(f => (f.name, f.dataType)), s"$name schema drifted")
      val cols = want.columns.map(col).toIndexedSeq
      val w = want.orderBy(cols: _*).collect().map(_.toString).toSeq
      val g = got.orderBy(cols: _*).collect().map(_.toString).toSeq
      assert(g === w, s"$name rows differ under drifted encodings")
      assert(w.nonEmpty, s"$name produced no rows — vacuous check")
    }
  }
}
