package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: candidate-pair counts of the banded-LSH blocking across
  * the deep docs fixtures, per banding — the number that separates
  * "verify work grew with true duplicates" (linear) from "the banding
  * collision floor surfaced" (the ~n² · J_floor^rowsPerBand term).
  * [[DeepDocsProbe]] measures wall time per scale; this names WHY a
  * ratio moved by measuring the pre-verify candidate volume each
  * banding emits at each scale. Two bandings by default: dd21's
  * production knobs (16 hashes, 4 bands of 4) where the fourth scale
  * surfaced the floor, and the documented production RESPONSE
  * (dd21_lsh_wide_bands: 128 hashes, 16 bands of 8 — collision
  * ~J_floor^8) — so the "widen the bands" claim is a measured
  * contrast, not prose.
  *
  * Results go to `BANDCANDS.json` (merged per banding+scale, keyed to
  * the fixture version) — [[ScaleCurve]] renders the mechanism note in
  * SCALING.md's fourth-scale section from that artifact, so measured
  * numbers never get baked into a generator as literals.
  *
  * Run after [[DeepDocsProbe]] (re-uses its generated fixtures):
  * `sbt "runMain graft.tools.BandCandidateProbe [fixtureDir ...]"`. */
object BandCandidateProbe {
  private val OutPath = "BANDCANDS.json"

  /** (numHashes, rowsPerBand, label) — dd21's two registered bandings. */
  private val Bandings = Seq(
    (16, 4, "16 hashes, 4 bands of 4 (dd21 production knobs)"),
    (128, 8, "128 hashes, 16 bands of 8 (dd21_wide response)"))

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_scale/sf10g", "/tmp/graft_scale/sf100gd",
        "/tmp/graft_scale/sfd4_20000000")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fresh = (for {
      (hashes, rpb, label) <- Bandings
      d <- dirs
    } yield {
      val docs = graft.core.Tables.documents(spark, d)
      val nDocs = docs.count()
      val sig = graft.operators.Dedup.minhashSignature(
        docs, "doc_id", "text", shingleK = 3, numHashes = hashes)
      val cands = graft.operators.Dedup.lshCandidatesEager(
        sig, "doc_id", numHashes = hashes, rowsPerBand = rpb).count()
      System.err.println(
        f"[band-cands] ${hashes}x$rpb $d%-34s docs=$nDocs%,12d " +
          f"candidates=$cands%,14d cands/doc=${cands.toDouble / nDocs}%8.3f")
      (label, nDocs) ->
        s"""{"docs":$nDocs,"candidates":$cands}"""
    }).toMap
    writeMerged(fresh)
    spark.stop()
  }

  /** Merge rows (keyed by banding label + docs count) into the committed
    * artifact, same fixture-version contract as DeepDocsProbe's writer. */
  private def writeMerged(fresh: Map[(String, Long), String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val prior: Map[(String, Long), String] = {
      val f = new java.io.File(OutPath)
      if (!f.exists()) Map.empty
      else try {
        val root = mapper.readTree(f)
        if (Option(root.get("fixture_version")).map(_.asText)
              .contains(ScaleCurve.FixtureVersion) &&
            root.has("bandings")) {
          val bs = root.get("bandings")
          (0 until bs.size()).flatMap { i =>
            val b = bs.get(i)
            val label = b.get("banding").asText
            val sc = b.get("scales")
            (0 until sc.size()).map { j =>
              (label, sc.get(j).get("docs").asLong) -> sc.get(j).toString
            }
          }.toMap
        } else Map.empty
      } catch { case _: Throwable => Map.empty }
    }
    val all = prior ++ fresh
    val bandingJson = Bandings.map { case (_, _, label) =>
      val scales = all.collect { case ((l, d), j) if l == label => d -> j }
        .toSeq.sortBy(_._1).map(_._2).mkString("[", ",", "]")
      s"""{"banding":"$label","scales":$scales}"""
    }.mkString("[", ",", "]")
    val json = s"""{"fixture_version":"${ScaleCurve.FixtureVersion}"""" +
      s""","bandings":$bandingJson}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(OutPath), json + "\n")
    println(json)
  }
}
