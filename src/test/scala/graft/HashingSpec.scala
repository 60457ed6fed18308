package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hashing, ShaPrefixLong}

/** Pins the native [[ShaPrefixLong]] to the composable formula it
  * replaced: the DuckDB oracle still computes
  * `('0x' || substr(sha256(s), 1, n))::bigint`, so any divergence here
  * breaks every hash-checked dedup query. */
class HashingSpec extends SparkTestBase {

  private def composed(c: org.apache.spark.sql.Column, n: Int) =
    conv(substring(sha2(c.cast("string"), 256), 1, n), 16, 10).cast("long")

  test("ShaPrefixLong equals conv(substr(sha2)) for 7 and 15 hex chars") {
    import spark.implicits._
    val tricky = Seq("", "a", "hello world", "héllo wörld é中文",
      "0", "-1", "2147483647", "\n\t", "  spaces  ", "a" * 500)
    val rng = new scala.util.Random(42)
    val rand = (1 to 500).map(_ => rng.alphanumeric.take(rng.nextInt(40)).mkString)
    val df = (tricky ++ rand).toDF("s")
    val mism = df.select(
        ShaPrefixLong(col("s"), 7).as("fast7"), composed(col("s"), 7).as("ref7"),
        ShaPrefixLong(col("s"), 15).as("fast15"), composed(col("s"), 15).as("ref15"))
      .filter(col("fast7") =!= col("ref7") || col("fast15") =!= col("ref15"))
    assert(mism.isEmpty)
  }

  test("ShaPrefixLong matches on non-string inputs via the Hashing cast") {
    import spark.implicits._
    val df = Seq(0L, 1L, -7L, 2147483647L, 1234567890123L).toDF("v")
    val mism = df.select(
        Hashing.sha28(col("v")).as("fast"),
        composed(col("v"), 7).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(mism.isEmpty)
    // null propagates
    val n = df.select(Hashing.sha28(lit(null).cast("string")).as("h")).head()
    assert(n.isNullAt(0))
  }

  test("MinHashOverHashed equals the k-fold transform+array_min form") {
    import spark.implicits._
    import graft.functions.{Hashing => H, MinHashOverHashed}
    val rnd = new scala.util.Random(3)
    val rows: Seq[Seq[java.lang.Long]] =
      (1 to 300).map(_ => Seq.fill(rnd.nextInt(12))(
        java.lang.Long.valueOf(rnd.nextInt(1 << 28).toLong))) ++
      Seq(Seq.empty[java.lang.Long],            // empty -> null minima
        Seq(null.asInstanceOf[java.lang.Long]), // all-null -> null minima
        Seq(java.lang.Long.valueOf(5L), null))  // null skipped
    val df = rows.toDF("hsh")
    val k = 6
    val native = (0 until k).map(i =>
      element_at(MinHashOverHashed(col("hsh"), k), i + 1).as(s"n$i"))
    val composed = H.minhashSeeds(k).zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("hsh"), h => (h * a + b) % H.P)).as(s"c$i")
    }
    val mism = df.select(native ++ composed: _*)
      .filter((0 until k).map(i =>
        not(col(s"n$i") <=> col(s"c$i"))).reduce(_ || _))
    assert(mism.isEmpty)
  }

  test("SimHashOverHashed equals the per-bit fold form, edges included") {
    import spark.implicits._
    import graft.functions.SimHashOverHashed
    val rnd = new scala.util.Random(5)
    val rows: Seq[Seq[java.lang.Long]] =
      (1 to 300).map(_ => Seq.fill(rnd.nextInt(12))(
        java.lang.Long.valueOf(rnd.nextInt(1 << 28).toLong))) ++
      Seq(Seq.empty[java.lang.Long],            // empty -> ALL bits set
        Seq(null.asInstanceOf[java.lang.Long]), // null elem -> -1 every bit
        Seq(java.lang.Long.valueOf(7L), null))
    val df = rows.toDF("hsh")
    for (bits <- Seq(16, 64)) {
      val composed = (0 until bits).map { j =>
        val contrib = aggregate(col("hsh"), lit(0L), (acc, h) =>
          acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        when(contrib >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      val mism = df.select(SimHashOverHashed(col("hsh"), bits).as("n"),
          composed.as("c"))
        .filter(not(col("n") <=> col("c")))
      assert(mism.isEmpty, s"bits=$bits")
    }
    // the empty-array edge really is the all-ones signature
    val empty = Seq(Seq.empty[java.lang.Long]).toDF("hsh")
      .select(SimHashOverHashed(col("hsh"), 64)).collect().head.getLong(0)
    assert(empty === -1L)
  }

  test("ShaPrefixLong survives both codegen and interpreted eval") {
    import spark.implicits._
    val df = Seq("x", "y", "z").toDF("s")
    // interpreted path: eval through a filter on the driver via collect of
    // the expression output, codegen path: the projection above. Compare
    // against precomputed constants so a dual-path bug can't cancel out.
    val out = df.select(ShaPrefixLong(col("s"), 7).as("h")).orderBy("s")
      .as[Long].collect().toSeq
    val expected = Seq("x", "y", "z").map { s =>
      val dig = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(dig.take(4).map("%02x".format(_)).mkString.take(7), 16)
    }
    assert(out == expected)
  }
}
