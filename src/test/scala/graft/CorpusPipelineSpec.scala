package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CorpusPipeline

/** Composed corpus-prep flow: planted exact dup, planted near dup, and a
  * junk doc must all be removed; survivors carry analysis columns. */
class CorpusPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val base = (1 to 50).map(i => s"alpha$i").mkString(" ")
  private val nearDup = ((1 to 48).map(i => s"alpha$i") ++ Seq("x", "y")).mkString(" ")
  private val distinct1 = (100 to 150).map(i => s"beta$i").mkString(" ")
  private val junk = "!!! ??? ;;; ###" // punctuation-heavy -> low quality

  private val docs = Seq(
    (1L, base), (2L, base), // exact dup pair
    (3L, nearDup), // near dup of 1
    (4L, distinct1),
    (5L, junk))
    .toDF("doc_id", "text")

  test("exact dedup keeps the minimum id") {
    val out = CorpusPipeline.dropExactDups(docs, "doc_id", "text")
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 3L, 4L, 5L))
  }

  test("near dedup removes the LSH-verified near duplicate") {
    val deduped = CorpusPipeline.dropExactDups(docs, "doc_id", "text")
    val out = CorpusPipeline.dropNearDups(deduped, "doc_id", "text",
      shingleK = 2, numHashes = 6, rowsPerBand = 1, minJaccard = 0.5)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(!ids.contains(3L), s"near-dup 3 survived: $ids")
    assert(ids.contains(1L) && ids.contains(4L))
  }

  test("full prepare: dups and junk removed, analysis columns attached") {
    val out = CorpusPipeline.prepare(docs, "doc_id", "text")
    val rows = out.collect()
    val ids = rows.map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(!ids.contains(2L) && !ids.contains(5L))
    assert(rows.forall(r => r.getAs[Long]("ws_tokens") > 0))
    assert(rows.forall(r => r.getAs[String]("pred_lang").nonEmpty))
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("fp"))))
  }
}
