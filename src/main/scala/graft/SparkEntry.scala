package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{EtlOps, GraphOps, JsonTimeOps, MultimodalOps, QualityOps, Relational, ScalarOps, TextOps, VectorOps}
import graft.pipeline.RawZone

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator (SURVEY.md §2); each takes
  * (session, sfDir) and returns a deterministic, totally-ordered DataFrame.
  * `oracleSql`: DuckDB-equivalent SQL per query key, over the same parquet
  * tables (bare table names). Column names/aliases must match the Spark
  * result exactly — the driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EtlOps.latestEventPerUser(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EtlOps.queries ++ Relational.queries ++ JsonTimeOps.queries ++
      TextOps.queries ++ VectorOps.queries ++ RawZone.queries ++
      MultimodalOps.queries ++ ScalarOps.queries ++ QualityOps.queries ++
      GraphOps.queries

  /** Queries benched in a dedicated child JVM (allocation-sensitive or
    * multi-job); aggregated from the modules that declare them so adding a
    * heavy query never requires a Bench edit (VERDICT r5 item 6).
    */
  def heavyQueries: Set[String] =
    TextOps.heavyQueries ++ VectorOps.heavyQueries ++
      MultimodalOps.heavyQueries ++ RawZone.heavyQueries ++
      Relational.heavyQueries ++ GraphOps.heavyQueries

  /** Bench child-JVM grouping for the heavy set (VERDICT r12 item 1c): one
    * child per FAMILY instead of one per query — 28 solo children cost
    * ~250 s of pure session spin-up on the r12 driver board, stretching the
    * measurement window into co-tenant load waves. Families share fixtures
    * and zone artifacts (the bm25 pair shares its postings, the ANN family
    * its indexes), so batching them also overlaps their IO warm-up; per-query
    * isolation inside a child stays clearCache + System.gc + min-of-two
    * timed runs. Must partition [[heavyQueries]] exactly —
    * BenchContractSpec pins it so a new heavy query can't silently vanish
    * from the board.
    */
  def heavyGroups: Seq[Seq[String]] = Seq(
    // r14: no longer the biggest allocator (artifact-consume + union-find
    // dispatch, 18.1 → 0.6 s) — kept solo so the r13→r14 board series
    // stays child-for-child comparable; fold into the neardup family if
    // the protocol is ever re-cut
    Seq("dedup_clusters"),
    Seq("bm25_topk", "bm25_index_topk", "tfidf_top_terms"),
    Seq("neardup_jaccard_pairs", "neardup_minhash_lsh", "simhash_neardup",
      "span_removal_stats"),
    Seq("streaming_neardup_ingest"), // owns checkpoints + a child session
    Seq("ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_ivfpq_topk",
      "incremental_ann_topk"),
    Seq("cosine_neardup_pairs", "quantized_neardup_pairs",
      "hard_negative_pairs", "semantic_dedup_vectors"),
    Seq("media_feature_stats", "audio_feature_stats", "video_frame_stats"),
    Seq("raw_pipeline_runs", "paged_connector_runs", "cursor_connector_runs",
      "compacted_zone_runs", "bucketed_join_orders"),
    Seq("graph_rank_stats", "graph_triangle_stats"))

  /** Bench pre-phase: build every persisted zone artifact for `sfDir` once,
    * serially, before any timed child starts (VERDICT r12 item 1a). Returns
    * the number of builds that actually ran.
    */
  def prebuildArtifacts(spark: SparkSession, sfDir: String): Long =
    graft.pipeline.Prebuild.all(spark, sfDir)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EtlOps.oracleSql ++ Relational.oracleSql ++ JsonTimeOps.oracleSql ++
      TextOps.oracleSql ++ VectorOps.oracleSql ++ RawZone.oracleSql ++
      MultimodalOps.oracleSql ++ ScalarOps.oracleSql ++ QualityOps.oracleSql ++
      GraphOps.oracleSql
}
