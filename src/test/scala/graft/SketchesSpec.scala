package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Contracts of the mergeable sketches (HLL + Count-Min). */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("HLL registers merge: per-group register-max equals whole-stream registers") {
    val df = (1 to 4000).map(i => (s"g${i % 3}", s"v${i % 1700}")).toDF("grp", "v")
    val perGroup = Sketches.hllRegisters(df, "grp", "v")
    val merged = perGroup.groupBy("bucket").agg(max("m_reg").as("m_reg"))
    val whole = Sketches.hllRegisters(df.withColumn("grp", lit("ALL")), "grp", "v")
      .select("bucket", "m_reg")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("HLL estimate within 10% on 5000 distinct values (raw regime)") {
    val df = (1 to 5000).map(i => ("a", s"value_$i")).toDF("grp", "v")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "grp", "v"))
      .select("hll_estimate").as[Double].head()
    assert(math.abs(est - 5000.0) / 5000.0 < 0.10, s"estimate $est")
  }

  test("HLL estimate within 5% on 300 distinct values (linear-counting regime)") {
    val df = (1 to 9000).map(i => ("a", s"value_${i % 300}")).toDF("grp", "v")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "grp", "v"))
      .select("hll_estimate").as[Double].head()
    assert(math.abs(est - 300.0) / 300.0 < 0.05, s"estimate $est")
  }

  test("HLL estimate is insensitive to duplication (set semantics)") {
    val once = (1 to 800).map(i => ("a", s"v$i")).toDF("grp", "v")
    val dup = (1 to 800).flatMap(i => Seq.fill(7)(("a", s"v$i"))).toDF("grp", "v")
    val e1 = Sketches.hllEstimate(Sketches.hllRegisters(once, "grp", "v"))
      .select("hll_estimate").as[Double].head()
    val e2 = Sketches.hllEstimate(Sketches.hllRegisters(dup, "grp", "v"))
      .select("hll_estimate").as[Double].head()
    assert(e1 == e2)
  }

  test("HLL pairwise overlap: inclusion-exclusion estimates track known truth") {
    // A = 1..3000, B = 2000..5000 -> |A|=3000 |B|=3001 |A∪B|=5000 |A∩B|=1001
    val docs = ((1 to 3000).map(i => ("A", s"w$i")) ++
        (2000 to 5000).map(i => ("B", s"w$i")))
      .map { case (s, w) => (s, s"$w $w $w") } // >= 3 tokens so k=3 shingles exist
      .toDF("source", "text")
    val out = Sketches.hllPairwiseOverlap(docs, "source", "text", k = 3)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("src_a") == "A" && r.getAs[String]("src_b") == "B")
    val union = r.getAs[Double]("est_union")
    val inter = r.getAs[Double]("est_intersect")
    assert(math.abs(union - 5000.0) / 5000.0 < 0.10, s"union $union")
    // intersection inherits the union's absolute error: wider tolerance
    assert(math.abs(inter - 1001.0) < 0.35 * 1001.0, s"intersect $inter")
  }

  test("Count-Min estimates upper-bound exact counts and are exact sans collisions") {
    val docs = (1 to 60)
      .map(i => (i.toLong, (1 to 20).map(j => s"w${(i * j) % 25}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Sketches.countMinShingles(docs, "text", k = 3, topN = 8)
      .select("exact_cnt", "cm_estimate").as[(Long, Long)].collect()
    assert(out.length == 8)
    assert(out.forall { case (ex, est) => est >= ex },
      "CM must never underestimate")
  }

  test("Count-Min probe set is the exact top-N by (count desc, shingle)") {
    val docs = (1 to 40)
      .map(i => (i.toLong, (1 to 15).map(j => s"t${(i + j) % 12}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Sketches.countMinShingles(docs, "text", k = 3, topN = 5)
    val got = out.select("shingle", "exact_cnt")
      .orderBy(col("exact_cnt").desc, col("shingle")).as[(String, Long)].collect()
    val expected = docs
      .select(explode(graft.operators.Dedup.shingles(col("text"), 3)).as("g"))
      .groupBy("g").count()
      .orderBy(col("count").desc, col("g")).limit(5)
      .as[(String, Long)].collect()
    assert(got.toSeq == expected.toSeq)
  }
}
