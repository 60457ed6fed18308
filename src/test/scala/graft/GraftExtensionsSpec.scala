package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, HyperplaneBucket, ShaPrefixLong}

/** The SQL registration surface: the native expressions callable from
  * `spark.sql`, value-identical to their Column-API forms. */
class GraftExtensionsSpec extends SparkTestBase {

  test("registered SQL functions match the Column-API expressions") {
    GraftExtensions.register(spark)
    // sha prefix: SQL call == composable conv(substr(sha2)) formula
    val sha = spark.sql(
      """SELECT graft_sha_prefix(s, 7) AS fast,
        |  CAST(conv(substring(sha2(s, 256), 1, 7), 16, 10) AS BIGINT) AS ref
        |FROM VALUES ('hello world'), (''), ('héllo 中文') AS t(s)""".stripMargin)
      .collect()
    sha.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // sorted intersect: merge-walk == size(array_intersect)
    val ic = spark.sql(
      """SELECT graft_sorted_intersect_count(array(1L, 2L, 3L, 9L),
        |  array(2L, 3L, 5L, 9L)) AS n""".stripMargin).collect().head.getInt(0)
    assert(ic === 3)
    // minhash: one-pass SQL call == the composable k-fold formula
    val mh = spark.sql(
      """SELECT graft_minhash(array(7L, 123456L, 999L), 2) AS m,
        |  array(
        |    array_min(transform(array(7L, 123456L, 999L),
        |      h -> (h * 1001 + 17) % 2147483647)),
        |    array_min(transform(array(7L, 123456L, 999L),
        |      h -> (h * 1003 + 7936) % 2147483647))) AS ref""".stripMargin)
      .collect().head
    assert(mh.getSeq[Long](0) === mh.getSeq[Long](1))
    // simhash: one-pass SQL call over a known bit pattern
    // tokens 0b01 and 0b11: bit0 counts +2 (set), bit1 counts 0 (set,
    // the >=0 rule), all other bit counts are -2 with 4 bits -> sig = 3
    val sh = spark.sql("SELECT graft_simhash(array(1L, 3L), 4) AS s")
      .collect().head.getLong(0)
    assert(sh === 3L)
    // hyperplane bucket: SQL call == Column-API expression
    import spark.implicits._
    val vecs = Seq(Seq(0.25, -0.5, 0.75), Seq(-1.0, 0.0, 1.0)).toDF("v")
    vecs.createOrReplaceTempView("graft_ext_vecs")
    val sqlBuckets = spark.sql(
      "SELECT graft_hyperplane_bucket(v, 8, 3, 1) AS b FROM graft_ext_vecs")
      .collect().map(_.getLong(0)).toSeq
    val apiBuckets = vecs.select(
        org.apache.spark.sql.GraftShim.column(
          HyperplaneBucket(org.apache.spark.sql.GraftShim.expression(col("v")),
            8, 3, 1)).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(sqlBuckets === apiBuckets)
  }

  test("non-literal size parameters are rejected with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_sha_prefix('x', 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("the construction-time injection hook wires without error") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
