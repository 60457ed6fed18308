package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Pins `Tables.events` against every parquet encoding the driver has
  * shipped for `events.ts`:
  *
  *   - TIMESTAMP(NANOS): Spark can't write it, but under
  *     `spark.sql.legacy.parquet.nanosAsLong` (which the loader sets) it
  *     decodes as a plain long of ns-since-epoch — so a long column
  *     exercises the identical branch.
  *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): decodes as TIMESTAMP_NTZ
  *     (the post-regeneration encoding, round 5's breakage).
  *   - TIMESTAMP(MICROS, isAdjustedToUTC=true): decodes as TimestampType.
  *
  * All three must yield the same session-UTC TimestampType column with
  * identical epoch values.
  */
class TablesSpec extends SparkTestBase {
  import spark.implicits._

  // 2024-03-01T12:34:56.789876Z and an exact-second value; the first has
  // sub-millisecond precision so a ms-level rounding bug would show.
  private val micros = Seq(1709296496789876L, 1709300000000000L)

  private def base = micros.zipWithIndex.map { case (us, i) =>
    (i.toLong, us, i.toLong % 2, "hr", 1.0 + i, "{}")
  }

  private def writeDir(): String =
    Files.createTempDirectory("tables-spec").toString

  private def readTs(dir: String): (DataType, Seq[Long]) = {
    val df = Tables.events(spark, dir)
    val dt = df.schema("ts").dataType
    val vals = df.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
    (dt, vals)
  }

  test("events loader: nanos-as-long encoding converts via integral div") {
    val dir = writeDir()
    base.map { case (id, us, uid, et, v, p) => (id, us * 1000L, uid, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (dt, vals) = readTs(dir)
    assert(dt === TimestampType)
    assert(vals === micros.sorted)
  }

  test("events loader: TIMESTAMP_NTZ (timestamp[us]) casts epoch-identically") {
    val dir = writeDir()
    val df = base.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      .drop("ts_us")
    assert(df.schema("ts").dataType === TimestampNTZType)
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (dt, vals) = readTs(dir)
    assert(dt === TimestampType)
    assert(vals === micros.sorted)
  }

  test("events loader: plain TimestampType passes through unchanged") {
    val dir = writeDir()
    base.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (dt, vals) = readTs(dir)
    assert(dt === TimestampType)
    assert(vals === micros.sorted)
  }

  test("events loader reads the driver testdata with a timestamp ts") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1L)
  }
}
