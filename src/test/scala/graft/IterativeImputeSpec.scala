package graft

import org.apache.spark.sql.functions._
import graft.operators.Impute

/** iterativeRidgeImpute — deterministic MICE option (a), SURVEY §7.5.1.
  * Properties: exploits cross-feature correlation (beats the median seed
  * on linearly-related data), converges (successive rounds move imputed
  * values less), is deterministic across runs, and leaves observed cells
  * untouched.
  */
class IterativeImputeSpec extends SparkTestBase {
  import spark.implicits._

  // y = 2x + 5 exactly; 30 rows per segment; some y's hidden
  private def fixture(hide: Set[Int]) = (0 until 60).map { i =>
    val seg = if (i < 30) "a" else "b"
    val x = (i % 30).toDouble
    val y = if (hide(i)) None else Some(2.0 * x + 5.0)
    (seg, i, Some(x): Option[Double], y)
  }.toDF("seg", "rid", "x", "y")

  private val hidden = Set(3, 7, 11, 19, 44, 52)

  test("recovers linear structure far better than the median seed") {
    val out = Impute.iterativeRidgeImpute(fixture(hidden), Seq("seg"),
        Seq("x", "y"), maxIter = 5, lambda = 1e-6)
      .collect().map(r => r.getAs[Int]("rid") -> r.getAs[Double]("y")).toMap
    for (i <- hidden) {
      val truth = 2.0 * (i % 30) + 5.0
      assert(math.abs(out(i) - truth) < 0.5,
        s"rid=$i imputed=${out(i)} truth=$truth")
      // the median seed would have been ~33.0 — far from edge truths
    }
  }

  test("iterations converge: later rounds move imputed values less") {
    def run(k: Int) = Impute.iterativeRidgeImpute(fixture(hidden), Seq("seg"),
        Seq("x", "y"), maxIter = k, lambda = 1.0)
      .collect().map(r => r.getAs[Int]("rid") -> r.getAs[Double]("y")).toMap
    val r1 = run(1); val r2 = run(2); val r4 = run(4)
    def delta(a: Map[Int, Double], b: Map[Int, Double]) =
      hidden.map(i => math.abs(a(i) - b(i))).max
    val d12 = delta(r1, r2)
    val d24 = delta(r2, r4)
    assert(d24 <= d12 + 1e-9, s"not converging: d12=$d12 d24=$d24")
  }

  test("deterministic across runs; observed cells untouched; small segments keep seed") {
    val a = Impute.iterativeRidgeImpute(fixture(hidden), Seq("seg"),
      Seq("x", "y"), maxIter = 3).collect().sortBy(_.getAs[Int]("rid"))
    val b = Impute.iterativeRidgeImpute(fixture(hidden), Seq("seg"),
      Seq("x", "y"), maxIter = 3).collect().sortBy(_.getAs[Int]("rid"))
    assert(a.map(_.getAs[Double]("y")).toSeq == b.map(_.getAs[Double]("y")).toSeq)
    // observed cells keep their exact input values
    a.filter(r => !hidden(r.getAs[Int]("rid"))).foreach { r =>
      assert(r.getAs[Double]("y") == 2.0 * (r.getAs[Int]("rid") % 30) + 5.0)
    }
    // a segment below minSegmentRows keeps its median-seeded value
    val tiny = Seq(("t", 0, Some(1.0), Some(7.0)), ("t", 1, Some(2.0), None),
      ("t", 2, Some(3.0), Some(9.0)))
      .toDF("seg", "rid", "x", "y")
    val out = Impute.iterativeRidgeImpute(tiny, Seq("seg"), Seq("x", "y"),
        maxIter = 3, minSegmentRows = 5)
      .filter($"rid" === 1).collect().head
    assert(out.getAs[Double]("y") == 8.0) // median of {7, 9}, no regression
  }
}
