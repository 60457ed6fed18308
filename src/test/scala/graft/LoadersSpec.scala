package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Pins the loader edge in both directions:
  *
  *   1. every `Tables.<name>` read of the actual driver testdata yields
  *      exactly the canonical schema (so a silent driver regeneration
  *      that changes dtypes surfaces here, not three operators deep);
  *   2. compatibly-drifted encodings (int32 keys, double embeddings,
  *      int n_chars) conform back to canonical with values intact;
  *   3. incompatible drift (a string where a number belongs, a missing
  *      column) fails loudly with the table and column named.
  */
class LoadersSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("driver testdata loads to exactly the canonical schemas") {
    val loaders: Map[String, String => org.apache.spark.sql.DataFrame] = Map(
      "region" -> (d => Tables.region(spark, d)),
      "nation" -> (d => Tables.nation(spark, d)),
      "customer" -> (d => Tables.customer(spark, d)),
      "supplier" -> (d => Tables.supplier(spark, d)),
      "part" -> (d => Tables.part(spark, d)),
      "orders" -> (d => Tables.orders(spark, d)),
      "lineitem" -> (d => Tables.lineitem(spark, d)),
      "events" -> (d => Tables.events(spark, d)),
      "documents" -> (d => Tables.documents(spark, d)),
      "embeddings" -> (d => Tables.embeddings(spark, d)))
    for ((name, loadIt) <- loaders) {
      val got = loadIt(sfDir).schema
      val want = Tables.canonical(name)
      assert(got.fields.map(f => (f.name, f.dataType)).toSeq ===
        want.fields.map(f => (f.name, f.dataType)).toSeq, s"table $name")
    }
  }

  test("embeddings: double elements and int32 ids conform back to canonical") {
    val dir = Files.createTempDirectory("loaders-spec").toString
    Seq((1, Seq(0.25, -0.5), 7), (2, Seq(1.0, 0.125), 9))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id").cast(IntegerType).as("vec_id"),
        col("embedding"), col("label").cast(LongType).as("label"))
      .write.parquet(s"$dir/embeddings.parquet")
    val df = Tables.embeddings(spark, dir)
    assert(df.schema("embedding").dataType === ArrayType(FloatType))
    assert(df.schema("vec_id").dataType === LongType)
    assert(df.schema("label").dataType === IntegerType)
    // exactly-representable doubles survive the downcast bit-identically
    val row = df.orderBy("vec_id").head()
    assert(row.getSeq[Float](1) === Seq(0.25f, -0.5f))
  }

  test("documents: int32 n_chars conforms to long") {
    val dir = Files.createTempDirectory("loaders-spec").toString
    Seq((1L, "hello", "en", "web", 5))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val df = Tables.documents(spark, dir)
    assert(df.schema("n_chars").dataType === LongType)
    assert(df.head().getLong(4) === 5L)
  }

  test("incompatible drift fails loudly, naming table and column") {
    val dir = Files.createTempDirectory("loaders-spec").toString
    Seq((1L, "x", "en", "web", "not-a-number"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](Tables.documents(spark, dir))
    assert(e.getMessage.contains("documents.n_chars"))
  }

  test("missing column fails loudly") {
    val dir = Files.createTempDirectory("loaders-spec").toString
    Seq((1L, "x")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](Tables.documents(spark, dir))
    assert(e.getMessage.contains("'lang' missing"))
  }
}
