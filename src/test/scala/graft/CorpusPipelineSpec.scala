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

  test("prepareKeeping: identical gate to prepare, trimmed columns") {
    val full = CorpusPipeline.prepare(docs, "doc_id", "text")
    val trimmed = CorpusPipeline.prepareKeeping(docs, "doc_id", "text",
      Seq("doc_id", "text"))
    assert(trimmed.columns.toSeq === Seq("doc_id", "text"))
    assert(trimmed.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === full.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("incrementalDedup: new batch deduped against corpus + within itself") {
    import graft.operators.Dedup
    val corpusText = (1 to 50).map(i => s"alpha$i").mkString(" ")
    val existing = Seq(
      (1L, corpusText),
      (2L, (100 to 150).map(i => s"beta$i").mkString(" ")))
      .toDF("doc_id", "text")
    val nearOfCorpus =
      ((1 to 48).map(i => s"alpha$i") ++ Seq("x", "y")).mkString(" ")
    val freshText = (200 to 240).map(i => s"gamma$i").mkString(" ")
    val incoming = Seq(
      (10L, corpusText),    // exact dup of corpus doc 1 -> dropped
      (11L, nearOfCorpus),  // near dup of corpus doc 1 -> dropped
      (12L, freshText),     // genuinely new -> kept
      (13L, freshText),     // exact within-batch dup of 12 -> dropped
      (14L, ((200 to 238).map(i => s"gamma$i") :+ "z").mkString(" ")))
      .toDF("doc_id", "text") // near within-batch dup of 12 -> dropped
    val kept = Dedup.incrementalDedup(existing, incoming, "doc_id", "text",
        shingleK = 2, numHashes = 6, rowsPerBand = 1, minJaccard = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(12L))
    // an empty incoming batch survives the pipeline
    assert(Dedup.incrementalDedup(existing, incoming.limit(0), "doc_id",
      "text", 2, 6, 1, 0.5).count() === 0L)
    // the at-scale overload with stored-and-reloaded digest/signature
    // tables (round-tripped through parquet, as a daily-ingest job would
    // read them) matches the convenience form
    val stateDir = java.nio.file.Files.createTempDirectory("graft-ddstate")
    Dedup.contentDigests(existing, "text")
      .write.mode("overwrite").parquet(s"$stateDir/digests")
    Dedup.minhashSignature(existing, "doc_id", "text", 2, 6)
      .write.mode("overwrite").parquet(s"$stateDir/sigs")
    val keptPre = Dedup.incrementalDedup(existing,
        spark.read.parquet(s"$stateDir/digests"),
        spark.read.parquet(s"$stateDir/sigs"),
        incoming, "doc_id", "text", 2, 6, 1, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptPre === Seq(12L))
  }

  test("assembleTraining: mixture gate, chunking, chunk-level dedup") {
    // two language groups; doc 11/12 share identical text so their chunks
    // collapse to one owner at the chunk-dedup stage
    val shared = (1 to 30).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (10L, "en", (1 to 40).map(i => s"en$i").mkString(" ")),
      (11L, "en", shared),
      (12L, "en", shared),
      (20L, "fr", (1 to 40).map(i => s"fr$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val out = CorpusPipeline.assembleTraining(corpus, "doc_id", "text",
      "lang", Map("en" -> 0.7, "fr" -> 0.3), frac = 1.0,
      chunkTokens = 20, overlapTokens = 5)
    val rows = out.collect()
    // every chunk_sha appears exactly once (chunk-level dedup)
    val shas = rows.map(_.getAs[String]("chunk_sha"))
    assert(shas.distinct.length === shas.length)
    // doc 11 and 12 are identical: only ONE of them owns chunks
    val owners = rows.map(_.getAs[Long]("doc_id")).distinct.sorted.toSeq
    assert(!(owners.contains(11L) && owners.contains(12L)))
    // chunks carry the group key and cover their doc with the stride rule
    assert(rows.forall(r => Seq("en", "fr").contains(r.getAs[String]("lang"))))
    // 40 tokens, chunk 20, stride 15 -> starts 0/15/30 (ceil((40-20)/15)+1)
    assert(rows.filter(_.getAs[Long]("doc_id") == 10L)
      .map(_.getAs[Long]("chunk_id")).sorted.toSeq === Seq(0L, 1L, 2L))
  }
}
