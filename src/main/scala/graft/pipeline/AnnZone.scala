package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.operators.VectorOps

/** Materialized ANN-index zone: the IVF coarse quantizer's two halves —
  * refined centroids (two Lloyd iterations over seeded starts) and the
  * closure-assigned posting lists — persisted once per corpus version,
  * keyed on embeddings.parquet ([[ArtifactZone]]'s fingerprint/temp-swap
  * commit, the [[DedupZone]] contract). This is how an IVF index is
  * operated in production: the build is an offline job per corpus
  * version, and queries pay only centroid scoring + probed-list rerank.
  * Before r11 `ann_ivf_topk` re-ran the full Lloyd chain + list build
  * inside every timed query.
  *
  * Layout: target/annzone/<sf>/{ivf_centroids,ivf_lists,lsh_buckets}
  *   - ivf_centroids: (cid, cv)                — K refined centroid vectors
  *   - ivf_lists:     (cid, neighbor_id, cv2)  — closure-assigned postings
  *   - lsh_buckets:   (neighbor_id, t, b)      — sign-LSH postings (no vectors)
  */
object AnnZone {

  def zoneDir(sfDir: String): String = {
    val sfName = sfDir.replaceAll("/+$", "").split('/').last
    s"target/annzone/$sfName"
  }

  private def src(sfDir: String): java.io.File =
    new java.io.File(sfDir, "embeddings.parquet")

  def ensureIvfCentroids(spark: SparkSession, sfDir: String): DataFrame =
    ArtifactZone.ensure(spark, s"${zoneDir(sfDir)}/ivf_centroids", src(sfDir)) {
      dir =>
        VectorOps.ivfCentroids(spark, sfDir)
          .write.mode(SaveMode.Overwrite).parquet(dir)
    }

  /** Lists build reads the centroid ARTIFACT (ensuring it first), so a
    * stale-lists-fresh-centroids zone never re-runs Lloyd — the pairs →
    * clusters dependency pattern from [[DedupZone]].
    */
  def ensureIvfLists(spark: SparkSession, sfDir: String): DataFrame =
    ArtifactZone.ensure(spark, s"${zoneDir(sfDir)}/ivf_lists", src(sfDir)) {
      dir =>
        val cents = ensureIvfCentroids(spark, sfDir)
        VectorOps.ivfLists(spark, sfDir, cents)
          .write.mode(SaveMode.Overwrite).parquet(dir)
    }

  /** The sign-LSH posting table (t, b, neighbor_id) — the hashing-family
    * index twin of the IVF lists. Postings only: the index stores ids, not
    * L=16 copies of the vectors; `annLshTopk`'s rerank fetches candidate
    * vectors by id from the corpus (the production retrieval layout).
    */
  def ensureLshBuckets(spark: SparkSession, sfDir: String): DataFrame =
    ArtifactZone.ensure(spark, s"${zoneDir(sfDir)}/lsh_buckets", src(sfDir)) {
      dir =>
        VectorOps.lshBuckets(spark, sfDir)
          .write.mode(SaveMode.Overwrite).parquet(dir)
    }
}
