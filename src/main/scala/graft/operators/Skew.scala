package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for hot keys (the 100 TB path; SURVEY §7.6).
  *
  * When one join key carries a disproportionate share of rows (one
  * participant/device with most events), a plain shuffle join puts the
  * whole hot key in one task. Salting splits the big side's hot keys
  * across `saltFactor` buckets and replicates the small side once per
  * bucket — bounded replication, even distribution, identical results.
  * (AQE's skew-join handles sort-merge cases adaptively; explicit salting
  * covers aggregations and joins AQE can't split.)
  */
object Skew {

  /** Salted equi-join: big side gets a deterministic per-row salt in
    * [0, saltFactor); small side is exploded across all salts. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy — partial aggregate on
    * (key, salt), then final on key. `partials` aggregate raw columns;
    * `finals` combine the partial columns (sums of sums, etc.). */
  def saltedAgg(df: DataFrame, key: String, saltFactor: Int,
                partials: Seq[org.apache.spark.sql.Column],
                finals: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finals.head, finals.tail: _*)
}
