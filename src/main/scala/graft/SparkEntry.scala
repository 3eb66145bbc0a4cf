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
      Relational.heavyQueries ++ GraphOps.heavyQueries ++
      QualityOps.heavyQueries

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
    *
    * Each family carries the child CONF its queries measured best under
    * (r16 A/B at sf0.1, quiet host, per-family fork):
    *   - "light"   = AQE off + 8 static shuffle partitions. The job-count
    *     lever: with AQE on, EVERY materialized exchange is its own driver
    *     job (jobs ≈ stages — the r15 board's 730 jobs × 100–140 ms
    *     substrate scheduling latency was the whole 85–112 s wall swing at
    *     identical plans); AQE off collapses a query to 1–2 jobs, and 8
    *     static post-shuffle partitions is what AQE's coalescing was
    *     picking for these sf0.1 exchanges anyway. Measured: bm25 family
    *     8.08 → 6.10 s, jaccard family 7.35 → 6.47 s, jobs 130 → 47 on the
    *     six worst queries — wall, Σcpu AND jobs all improved.
    *   - "light16" = AQE off + 16 partitions, for families whose
    *     post-shuffle stages carry real compute at sf0.1: graph joins
    *     (triangle census at 8-wide ran 2.73 s vs 1.11 s at 16-wide) and
    *     the media decode family.
    *   - "default" = AQE on (production conf): streaming_neardup_ingest
    *     tunes its own internal sessions and REGRESSED 5.75 → 10.68 s
    *     under a light outer session.
    * The non-heavy batches run "light" (Bench hardwires it). NOTE these
    * tags are bench measurement protocol ONLY — production sessions get
    * Tables.configure's AQE-on default; correctness is partitioning-
    * independent and the oracle gate re-proves it every round.
    */
  def heavyGroups: Seq[Seq[String]] = heavyGroupsConf.map(_._1)

  def heavyGroupsConf: Seq[(Seq[String], String)] = Seq(
    // r14: no longer the biggest allocator (artifact-consume + union-find
    // dispatch, 18.1 → 0.6 s) — kept solo so the r13→r14 board series
    // stays child-for-child comparable; fold into the neardup family if
    // the protocol is ever re-cut
    Seq("dedup_clusters") -> "light",
    Seq("bm25_topk", "bm25_index_topk", "tfidf_top_terms") -> "light",
    Seq("neardup_jaccard_pairs", "neardup_minhash_lsh", "simhash_neardup",
      "span_removal_stats") -> "light",
    // owns checkpoints + internally-tuned child sessions
    Seq("streaming_neardup_ingest") -> "default",
    // r17 (VERDICT r16 item 3): the r16 mid-weight light tier serialized
    // its 2-pass LM build — quiet A/B receipt at QualityOps.heavyQueries
    Seq("perplexity_filter_stats") -> "default",
    Seq("ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_ivfq_topk",
      "ann_ivfpq_topk", "incremental_ann_topk") -> "light",
    Seq("cosine_neardup_pairs", "quantized_neardup_pairs",
      "hard_negative_pairs", "semantic_dedup_vectors") -> "light",
    Seq("media_feature_stats", "audio_feature_stats",
      "video_frame_stats") -> "light16",
    Seq("raw_pipeline_runs", "paged_connector_runs", "cursor_connector_runs",
      "compacted_zone_runs", "bucketed_join_orders") -> "light",
    Seq("graph_rank_stats", "graph_triangle_stats") -> "light16")

  /** Batched (non-heavy) queries with REAL post-shuffle compute at sf0.1
    * (≥ ~0.8 executor-CPU-s on the r16 calibration board): their batch
    * children run the "light" conf (AQE off, 8 static shuffle partitions —
    * 2-wide serialized their compute: batch-3 A/B 22.27 s at width 2 vs
    * 13.21 s at width 8). Everything else batches at "light2" (AQE off,
    * 2 partitions — matches AQE-on wall at a third of the job count; 8-wide
    * cost +50% wall on the trivial batch-2 A/B: 10.52 vs 6.98 s). Bench
    * groups the two classes into separate children; BenchContractSpec pins
    * membership ⊆ registry and ∩ heavy = ∅.
    */
  def midweightBatchQueries: Set[String] = Set(
    "repeated_span_stats", "decontamination_pairs",
    "contamination_index_pairs",
    "incremental_neardup_stats", "phash_neardup", "ann_pq_topk",
    "oov_stats", "budget_selection_stats", "corrupt_record_stats",
    "quality_classifier_stats", "incremental_cluster_stats",
    "training_manifest_stats", "token_counts_bpe")

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
