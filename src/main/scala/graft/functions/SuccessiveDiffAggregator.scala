package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator for ordered successive-difference biomarkers (RMSSD /
  * pNN) — the `Aggregator` formulation SURVEY §2.12 lists as the
  * alternative to the lag-window version in
  * [[graft.operators.DailyAgg.successiveDiffStats]] (which stays the
  * default: it is oracle-checkable SQL).
  *
  * Buffers (ts, value) pairs per group and computes diffs after an
  * in-buffer sort in `finish` — correct regardless of input order, at the
  * cost of buffering one group's samples (bounded: one day of events).
  * Reference semantics: `src/biomarkers/hrv.py:92-145`.
  */
object SuccessiveDiffAggregator {

  case class Sample(ts: Long, v: Double)
  case class Buf(samples: List[Sample])
  case class DiffStats(rmssd: Double, pnnPct: Double, n: Int)

  def make(diffThreshold: Double): Aggregator[Sample, Buf, DiffStats] =
    new Aggregator[Sample, Buf, DiffStats] {
      override def zero: Buf = Buf(Nil)
      override def reduce(b: Buf, a: Sample): Buf = Buf(a :: b.samples)
      override def merge(b1: Buf, b2: Buf): Buf = Buf(b1.samples ::: b2.samples)
      override def finish(b: Buf): DiffStats = {
        val sorted = b.samples.sortBy(s => (s.ts, s.v)).map(_.v)
        if (sorted.size < 2) DiffStats(Double.NaN, Double.NaN, sorted.size)
        else {
          val diffs = sorted.zip(sorted.tail).map { case (x, y) => y - x }
          val rmssd = math.sqrt(diffs.map(d => d * d).sum / diffs.size)
          val pnn = diffs.count(d => math.abs(d) > diffThreshold).toDouble /
            diffs.size * 100.0
          DiffStats(rmssd, pnn, sorted.size)
        }
      }
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[DiffStats] = Encoders.product[DiffStats]
    }
}
