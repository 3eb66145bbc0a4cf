package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.operators.TextOps

/** Materialized LEXICAL index zone: the BM25 inverted index as the
  * query-independent per-posting contribution relation
  * (term, train_doc, contrib) — what Lucene persists as its
  * impact-carrying postings. The build is one tokenize+aggregate pass per
  * corpus version (`TextOps.bm25IndexBuild`); the zone-backed query
  * (`bm25_index_topk`) pays dispatch + scoring only, while the cold
  * `bm25_topk` keeps building in-query so the honest index-build cost
  * stays on the board — and the two share ONE oracle, so the driver hash
  * gate re-proves index-backed ≡ cold rebuild every round (the
  * compacted_zone_runs pattern).
  *
  * Keyed on documents.parquet with [[ArtifactZone]]'s fingerprint/
  * temp-swap commit. The version string pins the scoring constants and
  * the train-split definition — a k1/b/split change must invalidate the
  * persisted index because contrib bakes them in.
  *
  * Layout: target/lexicalzone/<sf>/bm25_postings
  */
object LexicalZone {

  def zoneDir(sfDir: String): String = {
    val sfName = sfDir.replaceAll("/+$", "").split('/').last
    s"target/lexicalzone/$sfName"
  }

  private def src(sfDir: String): java.io.File =
    new java.io.File(sfDir, "documents.parquet")

  private val Bm25Version = "bm25-k1_1.2-b_0.75-sat2.2lit-train80-v1"

  def ensureBm25Postings(spark: SparkSession, sfDir: String): DataFrame =
    ArtifactZone.ensure(spark, s"${zoneDir(sfDir)}/bm25_postings", src(sfDir),
      Bm25Version) { dir =>
      val (postings, postingScores) = TextOps.bm25IndexBuild(spark, sfDir)
      try postingScores.write.mode(SaveMode.Overwrite).parquet(dir)
      finally postings.unpersist(false)
    }
}
