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

  /** Artifact ALGORITHM versions (ArtifactZone fingerprint components):
    * these indexes must agree with query-time computation — query-side
    * sign-LSH signatures against the posting table, probe scoring against
    * the centroid set — so a parameter/code change has to invalidate the
    * persisted half even though the source parquet is unchanged. Derived
    * from the build constants where they exist; the trailing -v1 is bumped
    * on semantic changes the constants can't see (hash seed, tie-breaks).
    */
  private val IvfCentroidsVersion =
    s"ivf-k${VectorOps.IvfK}-lloyd${VectorOps.IvfLloydIters}-v1"
  private val IvfListsVersion =
    s"lists-r${VectorOps.IvfReplication}-v1+$IvfCentroidsVersion"
  private val LshBucketsVersion = {
    import graft.functions.SignLshBuckets
    s"signlsh-t${SignLshBuckets.Tables}-b${SignLshBuckets.Bits}-v1"
  }

  def ensureIvfCentroids(spark: SparkSession, sfDir: String): DataFrame =
    ArtifactZone.ensure(spark, s"${zoneDir(sfDir)}/ivf_centroids", src(sfDir),
      IvfCentroidsVersion) {
      dir =>
        VectorOps.ivfCentroids(spark, sfDir)
          .write.mode(SaveMode.Overwrite).parquet(dir)
    }

  /** Lists build reads the centroid ARTIFACT (ensuring it first), so a
    * stale-lists-fresh-centroids zone never re-runs Lloyd — the pairs →
    * clusters dependency pattern from [[DedupZone]].
    */
  def ensureIvfLists(spark: SparkSession, sfDir: String): DataFrame =
    ArtifactZone.ensure(spark, s"${zoneDir(sfDir)}/ivf_lists", src(sfDir),
      IvfListsVersion) {
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
    ArtifactZone.ensure(spark, s"${zoneDir(sfDir)}/lsh_buckets", src(sfDir),
      LshBucketsVersion) {
      dir =>
        VectorOps.lshBuckets(spark, sfDir)
          .write.mode(SaveMode.Overwrite).parquet(dir)
    }
}
