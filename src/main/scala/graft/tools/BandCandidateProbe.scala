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

  /** Image-signature bandings (hash kind, label) — measured with
    * SPARK_GRAFT_BAND_IMAGE=1 over the mm9 fixture's distinct
    * perceptual-hash signatures: the mm9 / mm9_wide contrast. The
    * candidate metric here is per distinct SIGNATURE (the banded join's
    * input after the equal-hash contraction), so rows also carry
    * `distinct_sigs`. */
  private val ImageBandings = Seq(
    ("aHash64", 2, "image aHash64, 4 bands of 16 (mm9 banding)"),
    ("aHash256", 2, "image aHash256, 16 bands of 16 (radius-15 exact)"),
    ("aHash256", 1, "image aHash256, 8 bands of 32 (mm9_wide banding)"))

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
    import org.apache.spark.sql.functions.{col, min}
    val imageMode = sys.env.get("SPARK_GRAFT_BAND_IMAGE").contains("1")
    // SPARK_GRAFT_BAND_HASH=aHash64|aHash256 narrows the image sweep to
    // one hash — the 64-bit banding's candidate volume at 5M docs
    // MEASURABLY out-spills this sandbox (the floor the wide hash
    // answers), so the decades past 0.5M are probed wide-only.
    val hashFilter = sys.env.get("SPARK_GRAFT_BAND_HASH")
    // artifact is merged + rewritten after EVERY row (not once at the
    // end): a deep row that out-spills the disk must not discard the
    // scales already measured
    if (imageMode) {
      for {
        (hash, bpw, label) <- ImageBandings
        if hashFilter.forall(f => f == hash || f == s"$hash/$bpw")
        d <- dirs
      } {
        val nDocs = graft.core.Tables.documents(spark, d).count()
        val (sigStats, wordCols) =
          if (hash == "aHash64")
            (graft.queries.TextQueries.mm9DocSigs(spark, d)
              .groupBy("sig_hi", "sig_lo").agg(min("doc_id").as("rid")),
              Seq("sig_lo", "sig_hi"))
          else {
            val sigCols = (0 until 8).map(w => s"sig$w")
            (graft.queries.TextQueries.mm9WideDocSigs(spark, d)
              .groupBy(sigCols.head, sigCols.tail: _*)
              .agg(min("doc_id").as("rid")),
              sigCols)
          }
        // persist the contraction so the 5M-image PNG decode is paid
        // once, not once per banded union leg
        val ss = sigStats.persist()
        val nSigs = ss.count()
        val cands = graft.operators.Dedup.hammingBandCandidatesWords(
          ss, "rid", wordCols, bandsPerWord = bpw).count()
        ss.unpersist()
        System.err.println(
          f"[band-cands] $hash%-8s $d%-34s docs=$nDocs%,12d " +
            f"sigs=$nSigs%,12d candidates=$cands%,14d " +
            f"cands/sig=${cands.toDouble / nSigs}%8.3f")
        writeMerged(Map((label, nDocs) ->
          s"""{"docs":$nDocs,"candidates":$cands,"distinct_sigs":$nSigs}"""))
      }
    } else for {
      (hashes, rpb, label) <- Bandings
      d <- dirs
    } {
      val docs = graft.core.Tables.documents(spark, d)
      val nDocs = docs.count()
      val sig = graft.operators.Dedup.minhashSignature(
        docs, "doc_id", "text", shingleK = 3, numHashes = hashes)
      val cands = graft.operators.Dedup.lshCandidatesEager(
        sig, "doc_id", numHashes = hashes, rowsPerBand = rpb).count()
      System.err.println(
        f"[band-cands] ${hashes}x$rpb $d%-34s docs=$nDocs%,12d " +
          f"candidates=$cands%,14d cands/doc=${cands.toDouble / nDocs}%8.3f")
      writeMerged(Map((label, nDocs) ->
        s"""{"docs":$nDocs,"candidates":$cands}"""))
    }
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
    val allLabels = Bandings.map(_._3) ++ ImageBandings.map(_._3)
    val bandingJson = allLabels.flatMap { label =>
      val scales = all.collect { case ((l, d), j) if l == label => d -> j }
        .toSeq.sortBy(_._1).map(_._2)
      if (scales.isEmpty) None
      else Some(s"""{"banding":"$label","scales":${
        scales.mkString("[", ",", "]")}}""")
    }.mkString("[", ",", "]")
    val json = s"""{"fixture_version":"${ScaleCurve.FixtureVersion}"""" +
      s""","bandings":$bandingJson}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(OutPath), json + "\n")
    println(json)
  }
}
