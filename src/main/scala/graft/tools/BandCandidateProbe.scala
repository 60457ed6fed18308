package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: candidate-pair counts of the PRODUCTION banding (dd21's
  * 16 hashes as 4 bands of 4, trigram shingles) across the deep docs
  * fixtures — the number that separates "verify work grew with true
  * duplicates" (linear) from "the banding collision floor surfaced"
  * (the ~n² · J_floor⁴ term). DeepDocsProbe measures dd21's wall time
  * per scale; this names WHY a ratio moved by measuring the pre-verify
  * candidate volume the banding emits at each scale.
  *
  * Results go to `BANDCANDS.json` (merged per scale, keyed to the
  * fixture version) — [[ScaleCurve]] renders the mechanism note in
  * SCALING.md's fourth-scale section from that artifact, so measured
  * numbers never get baked into a generator as literals.
  *
  * Run after [[DeepDocsProbe]] (re-uses its generated fixtures):
  * `sbt "runMain graft.tools.BandCandidateProbe [fixtureDir ...]"`. */
object BandCandidateProbe {
  private val OutPath = "BANDCANDS.json"

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
    val fresh = dirs.map { d =>
      val docs = graft.core.Tables.documents(spark, d)
      val nDocs = docs.count()
      val sig = graft.operators.Dedup.minhashSignature(
        docs, "doc_id", "text", shingleK = 3, numHashes = 16)
      val cands = graft.operators.Dedup.lshCandidatesEager(
        sig, "doc_id", numHashes = 16, rowsPerBand = 4).count()
      System.err.println(
        f"[band-cands] $d%-34s docs=$nDocs%,12d candidates=$cands%,14d " +
          f"cands/doc=${cands.toDouble / nDocs}%8.3f")
      nDocs -> s"""{"docs":$nDocs,"candidates":$cands}"""
    }.toMap
    writeMerged(fresh)
    spark.stop()
  }

  /** Merge rows (keyed by docs count) into the committed artifact, same
    * fixture-version contract as DeepDocsProbe's writer. */
  private def writeMerged(fresh: Map[Long, String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val prior: Map[Long, String] = {
      val f = new java.io.File(OutPath)
      if (!f.exists()) Map.empty
      else try {
        val root = mapper.readTree(f)
        if (Option(root.get("fixture_version")).map(_.asText)
              .contains(ScaleCurve.FixtureVersion)) {
          val sc = root.get("scales")
          (0 until sc.size()).map { i =>
            sc.get(i).get("docs").asLong -> sc.get(i).toString
          }.toMap
        } else Map.empty
      } catch { case _: Throwable => Map.empty }
    }
    val all = (prior ++ fresh).toSeq.sortBy(_._1).map(_._2)
      .mkString("[", ",", "]")
    val json = s"""{"fixture_version":"${ScaleCurve.FixtureVersion}"""" +
      s""","banding":"16 hashes, 4 bands of 4, trigram shingles"""" +
      s""","scales":$all}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(OutPath), json + "\n")
    println(json)
  }
}
