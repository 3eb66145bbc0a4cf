package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, count, countDistinct, lit}

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

  // v2: postings hash-partitioned on the probe key into parallelism-many
  // files (layout change → version bump forces the rebuild)
  private val Bm25Version = "bm25-k1_1.2-b_0.75-sat2.2lit-train80-v2"

  def ensureBm25Postings(spark: SparkSession, sfDir: String): DataFrame =
    ArtifactZone.ensure(spark, s"${zoneDir(sfDir)}/bm25_postings", src(sfDir),
      Bm25Version) { dir =>
      val (postings, postingScores) = TextOps.bm25IndexBuild(spark, sfDir)
      // hash-partition on the probe key into parallelism-many files: AQE
      // coalesced the build's final join to ONE output file, which capped
      // the zone-backed query's postings scan at one task — invisible at
      // sf0.1 (411 KB), catastrophic at 10× (167 s index-backed vs 16 s
      // cold, measured r13; the exact single-file lesson
      // DedupZone.ensureTrainPostings already recorded). At 100 TB an
      // inverted index is many term-hashed segment files for this reason.
      try postingScores
        .repartition(spark.sparkContext.defaultParallelism, col("term"))
        .write.mode(SaveMode.Overwrite).parquet(dir)
      finally postings.unpersist(false)
    }

  /** Index METADATA artifact: (term, df, n_train) — df per vocabulary term
    * plus the train-doc count denormalized onto every row (the relation is
    * vocabulary-sized, the constant column costs nothing). Lucene keeps
    * exactly these in its index (df per term, docCount in segment info);
    * before this artifact existed the zone-backed query re-derived both
    * with TWO postings-wide aggregations per invocation — at 100 TB that
    * is re-scanning the inverted index to learn numbers the build already
    * knew (r13, VERDICT r12 item 5). Built FROM the committed postings
    * artifact (one aggregation pass at build time, DAG-ordered like
    * DedupZone's pairs→clusters), same version pin — a scoring-constant
    * change invalidates both together.
    */
  def ensureBm25Df(spark: SparkSession, sfDir: String): DataFrame =
    ArtifactZone.ensure(spark, s"${zoneDir(sfDir)}/bm25_df", src(sfDir),
      Bm25Version) { dir =>
      val ps = ensureBm25Postings(spark, sfDir)
      ps.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(
          ps.agg(countDistinct(col("train_doc")).as("n_train"))))
        .write.mode(SaveMode.Overwrite).parquet(dir)
    }
}
