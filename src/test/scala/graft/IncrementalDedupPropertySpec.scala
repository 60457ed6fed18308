package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Dedup

/** Randomized invariants of the incremental daily-ingest dedup path
  * ([[Dedup.incrementalDedup]]) — the fixture test pins one scenario;
  * these hold over seeded random corpora built from a small shared
  * vocabulary (so exact dups, near dups, and band collisions all occur
  * by construction):
  *
  *  1. survivors are a subset of the incoming batch, rows unmodified;
  *  2. no survivor's text exists verbatim in the corpus (exact stage);
  *  3. survivors are pairwise distinct (within-batch exact stage);
  *  4. idempotence: feeding the survivors back through the same pipeline
  *     against the same corpus drops nothing — each stage (exact
  *     anti-join, cross-frame band+verify, within-batch clustering)
  *     already removed everything it considers a duplicate;
  *  5. against an EMPTY corpus the path degenerates to exactly the batch
  *     dedup composition (lshVerifiedPairs -> dupClusters ->
  *     keepClusterRepresentatives) — the incremental within-batch stage
  *     cannot drift from the dd9 batch path.
  */
class IncrementalDedupPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val K = 2; private val H = 6; private val RPB = 1
  private val MINJ = 0.5

  private def run(existing: DataFrame, incoming: DataFrame): DataFrame =
    Dedup.incrementalDedup(existing, incoming, "doc_id", "text", K, H, RPB, MINJ)

  test("randomized corpora: subset, exact stages, idempotence, batch-path equality") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val vocab = (0 until 10 + trial).map(j => s"w$j")
      def doc(): String =
        (0 until 4 + rnd.nextInt(7)).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      val existingRows = (0L until 8L).map(i => (i, doc()))
      val exTexts = existingRows.map(_._2)
      // incoming: random docs + a planted exact corpus dup + a planted
      // one-token-appended near dup of a corpus doc + a within-batch
      // exact dup pair
      val fresh = (100L until 106L).map(i => (i, doc()))
      val planted = Seq(
        (200L, exTexts(rnd.nextInt(exTexts.size))),
        (201L, exTexts(rnd.nextInt(exTexts.size)) + " " + vocab.head),
        (202L, fresh.head._2))
      val incomingRows = rnd.shuffle(fresh ++ planted)
      val existing = existingRows.toDF("doc_id", "text")
      val incoming = incomingRows.toDF("doc_id", "text")

      val survivors = run(existing, incoming)
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val incomingMap = incomingRows.toMap

      // 1. subset of incoming, rows unmodified
      survivors.foreach { case (id, text) =>
        assert(incomingMap.get(id).contains(text), s"trial $trial: alien row $id")
      }
      // 2. exact-vs-corpus: no surviving text is verbatim in the corpus
      val exSet = exTexts.toSet
      assert(survivors.forall { case (_, t) => !exSet(t) },
        s"trial $trial: corpus-exact dup survived")
      // 3. within-batch exact: pairwise distinct survivor texts
      assert(survivors.map(_._2).distinct.length === survivors.length,
        s"trial $trial: batch-exact dup survived")
      // 4. idempotence: the survivor set is a fixed point of the pipeline
      val again = run(existing, survivors.toSeq.toDF("doc_id", "text"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(again === survivors.map(_._1).toSeq,
        s"trial $trial: pipeline not idempotent on its own output")
      // 5. empty corpus == the dd9 batch-dedup composition
      val viaIncremental = run(existing.limit(0), incoming)
        .collect().map(_.getLong(0)).sorted.toSeq
      val viaBatch = Dedup.keepClusterRepresentatives(incoming, "doc_id",
          Dedup.dupClusters(Dedup.lshVerifiedPairs(incoming, "doc_id", "text",
            K, H, RPB, MINJ)))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(viaIncremental === viaBatch,
        s"trial $trial: incremental-vs-batch drift on empty corpus")
    }
  }
}
