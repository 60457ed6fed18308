package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Training-data corpus preparation: the composed dedup + quality + text
  * analysis flow a large-scale pipeline runs over raw documents —
  * exact-dup removal, near-dup removal via MinHash LSH candidates +
  * Jaccard verification, quality filtering, language ID and token
  * accounting. Each stage is one of the engine's operators; the
  * composition is pure DataFrame transformations end to end.
  */
object CorpusPipeline {

  /** Drop exact duplicates (keep the minimum id per identical text). */
  def dropExactDups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = Dedup.exactDups(docs, idCol, textCol).select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Drop near-duplicates: banded-LSH candidates, verified with exact
    * n-gram Jaccard >= `minJaccard`; of each verified pair the larger id
    * is removed. Pairwise work only on LSH candidates, never all pairs. */
  def dropNearDups(docs: DataFrame, idCol: String, textCol: String,
                   shingleK: Int, numHashes: Int, rowsPerBand: Int,
                   minJaccard: Double): DataFrame = {
    val sig = Dedup.minhashSignature(docs, idCol, textCol, shingleK, numHashes)
    val candidates = Dedup.lshCandidates(sig, idCol, numHashes, rowsPerBand)
    val verified = Dedup.verifyPairsJaccard(candidates, docs, idCol, textCol,
      shingleK, minJaccard)
    val dupIds = verified.select(col("id_b").as(idCol)).distinct()
    docs.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Quality gate + analysis columns: keeps docs with quality_score >=
    * `minQuality`, attaches pred_lang / token counts / fingerprint. */
  def analyze(docs: DataFrame, textCol: String, minQuality: Double): DataFrame =
    TextAnalysis.tokenCounts(
        TextAnalysis.qualityColumns(docs, textCol), textCol)
      .withColumn("pred_lang", TextAnalysis.langId(col(textCol)))
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .filter(col("quality_score") >= minQuality)

  /** Full corpus prep: exact dedup -> near dedup -> quality/analysis. */
  def prepare(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    analyze(
      dropNearDups(
        dropExactDups(docs, idCol, textCol),
        idCol, textCol, shingleK = 3, numHashes = 6, rowsPerBand = 3,
        minJaccard = 0.7),
      textCol, minQuality = 30.0)
}
