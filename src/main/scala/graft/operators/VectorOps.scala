package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{GraftExtensions, TopKByScore}

/** Similarity search over `embeddings.embedding` (array<float>, dim 64) —
  * BASELINE north star.
  *
  * All vector math is higher-order Catalyst expressions (`zip_with` +
  * `aggregate`) — codegen-visible, no UDFs (SURVEY §2.2 UDF row).
  *
  * 100 TB design: brute-force top-k broadcasts the (small) query set and
  * scans candidates once — linear, shuffle-free except the final per-query
  * top-k. The LSH variant buckets vectors by random-hyperplane signatures so
  * each query probes only its bucket — the standard sub-linear ANN layout
  * (probe multiple buckets / repeat tables to trade recall for cost).
  */
object VectorOps {

  /** Codegen'd cosine via the native Catalyst expression `CosineSim` —
    * a fused primitive loop inside whole-stage codegen. The interpreted HOF
    * form (`aggregate(zip_with(...))`, ~100 µs/pair) lives on only as the
    * reference implementation in CustomFunctionSpec, which proves the two
    * agree bit-for-bit (identical left-to-right summation order) — so
    * swapping it in here cannot move an oracle hash (VERDICT r2 item 2).
    */
  private def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    GraftExtensions.register(spark)
    call_function("cosine_sim", a, b)
  }

  private def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Brute-force exact cosine top-k: queries = vec_id < 10, k = 5.
    * Output is rank-compared on ids only (no float scores in the hash) —
    * FIXTURES §B.3.4.
    */
  def annCosineTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cand = emb.select(col("vec_id").as("neighbor_id"), col("v").as("cv"))
    // Broadcast the QUERY side (10 rows), stream the candidate corpus once —
    // the only orientation that survives a 100× corpus (the reverse would
    // broadcast the full embeddings table). Pinned by PlanShapeSpec.
    val sims = cand.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(spark, col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val annCosineTopkSql: String =
    """SELECT query_id, rank, neighbor_id FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         row_number() OVER (
      |           PARTITION BY q.vec_id
      |           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
      |                    c.vec_id) AS rank
      |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      |  WHERE q.vec_id < 10)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Random-hyperplane (sign) LSH ANN — the sub-linear scale path (Charikar
    * '02 SimHash for vectors). L=16 hash tables × b=4 sign bits each;
    * hyperplanes are pseudo-random ±1 vectors derived via
    * xxhash64(table, plane, dim) — deterministic, no stored model. Candidates
    * = union over tables of same-bucket vectors, then exact cosine top-k on
    * the candidate set only. For a neighbor at cos θ, per-bit collision
    * p = 1 − θ/π, table hit p^b, overall 1 − (1 − p^b)^L (≈0.7 at cos 0.35,
    * →1 as clusters tighten). Approximate → no DuckDB oracle (driver runs
    * the rows>0 check); recall vs the exact variant is asserted in ScalaTest.
    */
  def annLshTopk(spark: SparkSession, sfDir: String): DataFrame = {
    GraftExtensions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))

    // One row per (vector, table): the vector shuffles L times — O(n·L),
    // never O(n²). All L (= 16) table signatures come from ONE fused-loop
    // pass of the native `sign_lsh_buckets` expression (posexplode position
    // = table id); the ±1 hyperplane matrix is a precomputed constant, not
    // per-row hashing — see SignLshBuckets.
    val bucketed = emb.select(col("vec_id"), col("v"),
        posexplode(call_function("sign_lsh_buckets", col("v"))).as(Seq("t", "b")))

    val queries = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("t"), col("b"))
    val cand = bucketed
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
        col("t").as("ct"), col("b").as("cb"))
    val candidates = queries.join(cand,
        col("t") === col("ct") && col("b") === col("cb") &&
          col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("cv"))
      .dropDuplicates("query_id", "neighbor_id") // union across tables
    val sims = candidates.withColumn("cos",
      round(cosine(spark, col("qv"), col("cv")), 6))
    // Per-query top-k via the typed TopKByScore Aggregator (bounded
    // min-heap, map-side PARTIAL aggregation): each partition reduces to
    // ≤ k rows per query before the shuffle, where the previous
    // row_number()-window form shuffled and sorted EVERY candidate row.
    // Tie-break (score desc, id asc) matches the window form exactly, so
    // the output is identical (AnnRecallSpec's floor stands).
    val topk = udaf(new TopKByScore(5),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    sims.groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cos")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb._1").as("neighbor_id"), col("nb._2").as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF (inverted-file) ANN — the clustering-based scale path, complement
    * to the hashing-based `annLshTopk` (both are mandated north-star
    * variants). Coarse quantizer: K deterministic seed centroids (the
    * embeddings of the K lowest vec_ids — fixed-seed init) refined by ONE
    * distributed Lloyd iteration (VERDICT r5 stretch item 8): assign every
    * vector to its nearest seed, replace each centroid with its cluster
    * mean. Fully declarative — broadcast-assign + scalar (cid, dim, value)
    * partial-agg means, no driver collect; further iterations are the same
    * two stages repeated. Every vector is then assigned to its nearest
    * refined centroid's inverted list; a query probes its `nprobe` nearest
    * lists and exact-reranks only those candidates.
    *
    * 100 TB cost model: each assignment pass is a broadcast of K centroids
    * against a linear scan (no shuffle on the big side beyond the list
    * write); queries touch nprobe/K of the corpus instead of all of it.
    * Approximate → no DuckDB oracle (driver rows-check); recall vs the
    * exact scan is asserted in `AnnRecallSpec`.
    */
  def annIvfTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 16
    val nprobe = 2
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val seeds = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

    // Nearest-centroid argmax as a max_by PARTIAL AGGREGATE (VERDICT r6
    // item 4): the former row_number window shuffled and sorted all n×K
    // scored rows per pass; max_by reduces each map partition to one row
    // per vector before the shuffle. The ordering struct(sim, -cid)
    // reproduces the window's (sim DESC, cid ASC) tie-break exactly.
    def nearest(scored: DataFrame): DataFrame =
      scored.groupBy(col("vec_id"))
        .agg(max_by(struct(col("cid"), col("v")),
          struct(col("sim"), -col("cid"))).as("best"))
        .select(col("vec_id"), col("best.cid").as("cid"), col("best.v").as("v"))

    // one Lloyd iteration: nearest seed per vector → per-(cid, dim) mean →
    // re-assembled centroid vectors (empty clusters drop out, standard)
    val members = nearest(
        emb.crossJoin(broadcast(seeds))
          .withColumn("sim", cosine(spark, col("v"), col("cv"))))
      .select(col("cid"), col("v"))
    val cents = members
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))

    // score every vector against the refined centroids (codegen'd cosine)
    val scored = emb.crossJoin(broadcast(cents))
      .withColumn("sim", cosine(spark, col("v"), col("cv")))

    val lists = nearest(scored)
      .select(col("cid"), col("vec_id").as("neighbor_id"), col("v").as("cv2"))

    // top-nprobe probe lists per query via the typed bounded-heap aggregate
    // (same TopKByScore as the LSH path: map-side partial, no window; ties
    // (sim DESC, cid ASC) match the former window form).
    val probeK = udaf(new TopKByScore(nprobe),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    val probes = scored.filter(col("vec_id") < 10)
      .groupBy(col("vec_id"))
      .agg(first(col("v")).as("qv"), probeK(col("cid"), col("sim")).as("pl"))
      .select(col("vec_id").as("query_id"), col("qv"), explode(col("pl")).as("p"))
      .select(col("query_id"), col("qv"), col("p._1").as("cid"))

    val candidates = probes.join(lists, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val sims = candidates.withColumn("cos",
      round(cosine(spark, col("qv"), col("cv2")), 6))
    val topk = udaf(new TopKByScore(5),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    sims.groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cos")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb._1").as("neighbor_id"), col("nb._2").as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-dup: all vector pairs with cosine ≥ 0.4 — the
    * exact small-SF variant (the ANN/LSH path above is the 100 TB shape).
    * Broadcast all-pairs with explicit scan repartition (the 2 MB parquet
    * file would otherwise cap parallelism at one task).
    */
  def cosineNeardupPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val a = emb.select(col("vec_id").as("vec_a"), col("v").as("va"))
      .repartition(spark.sparkContext.defaultParallelism)
    val b = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("cos", round(cosine(spark, col("va"), col("vb")), 4))
      .filter(col("cos") >= 0.4)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val cosineNeardupPairsSql: String =
    """SELECT vec_a, vec_b, cos FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      |WHERE cos >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin

  /** Int8 scalar quantization: per-vector symmetric scale (max |x| → ±127),
    * values floor'd to integers — floor, not round, because floor of an
    * identical IEEE double is engine-identical while round's tie rule is
    * not (HALF_UP vs HALF_EVEN). The quantizer is therefore exactly
    * DuckDB-reproducible, and so is cosine over the quantized vectors
    * (integer-valued products sum exactly in double).
    *
    * 100 TB rationale: int8 storage cuts the resident vector set 4× and the
    * broadcast/shuffle payload with it; quantization composes with the
    * LSH/IVF candidate generation (it shrinks the vectors, not the pair
    * set). This query is the small-SF oracle form — same pair enumeration
    * as `cosineNeardupPairs` — plus per-pair agreement with the float
    * cosine, making the quantization error measurable in-engine.
    */
  def quantizedNeardupPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val scale = array_max(transform(col("v"), x => abs(x)))
    val q = emb.select(col("vec_id"), col("v"),
      transform(col("v"), x => floor(x / scale * 127).cast("double")).as("qv"))
    val a = q.select(col("vec_id").as("vec_a"), col("v").as("va"), col("qv").as("qa"))
      .repartition(spark.sparkContext.defaultParallelism)
    val b = q.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("qv").as("qb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("qcos", round(cosine(spark, col("qa"), col("qb")), 4))
      .filter(col("qcos") >= 0.4)
      .withColumn("float_cos", round(cosine(spark, col("va"), col("vb")), 4))
      .select(col("vec_a"), col("vec_b"), col("qcos"), col("float_cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val quantizedNeardupPairsSql: String =
    """WITH q AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |         list_transform(embedding::DOUBLE[],
      |           x -> floor(x / list_max(list_transform(embedding::DOUBLE[], y -> abs(y))) * 127)) AS qv
      |  FROM embeddings
      |)
      |SELECT vec_a, vec_b, qcos, float_cos FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |         round(list_cosine_similarity(a.qv, b.qv), 4) AS qcos,
      |         round(list_cosine_similarity(a.v, b.v), 4) AS float_cos
      |  FROM q a JOIN q b ON a.vec_id < b.vec_id)
      |WHERE qcos >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin

  /** Multimodal alignment: text row ⋈ its embedding row on id — the
    * canonical "document + vector column" layout. Broadcast the smaller side.
    */
  def multimodalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), col("label"),
        col("n_chars"), size(col("embedding")).as("dim"))
      .orderBy(col("doc_id"))
  }

  val multimodalJoinSql: String =
    """SELECT doc_id, lang, label, n_chars, len(embedding) AS dim
      |FROM documents JOIN embeddings ON doc_id = vec_id
      |ORDER BY doc_id""".stripMargin

  /** Per-label embedding centroids: posexplode → per-(label, dim) mean →
    * re-assemble the vector ordered by dim. The elementwise-mean layout that
    * scales — the naive `collect_list(embedding)` per label would pull whole
    * groups onto single tasks; this shuffles scalar (label, dim, value)
    * triples with map-side partial aggregation.
    */
  def labelCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    emb.select(col("label"), posexplode(toDouble(col("embedding"))).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("v")), 6).as("m"))
      .groupBy(col("label"))
      // Serialized as a CSV of DECIMAL(18,6) strings: raw array cells crash
      // the driver's checker, and double→string rendering is engine-specific
      // (exponent notation) while fixed-scale decimal prints identically.
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m").cast("decimal(18,6)").cast("string")), ",").as("centroid"))
      .orderBy(col("label"))
  }

  val labelCentroidsSql: String =
    """SELECT label, array_to_string(list(v::DECIMAL(18,6)::VARCHAR ORDER BY pos), ',') AS centroid FROM (
      |  SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS v
      |  FROM embeddings, range(1, 65) t(i)
      |  GROUP BY label, i)
      |GROUP BY label
      |ORDER BY label""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cosine_neardup_pairs" -> (cosineNeardupPairs(_, _)),
    "quantized_neardup_pairs" -> (quantizedNeardupPairs(_, _)),
    "label_centroids" -> (labelCentroids(_, _)),
    "ann_cosine_topk" -> (annCosineTopk(_, _)),
    "ann_lsh_topk" -> (annLshTopk(_, _)),
    "ann_ivf_topk" -> (annIvfTopk(_, _)),
    "multimodal_join" -> (multimodalJoin(_, _))
  )

  /** Bench solo-fork set (see TextOps.heavyQueries): the ANN/near-dup family
    * allocates enough per-pair state to need per-JVM timing isolation.
    */
  val heavyQueries: Set[String] = Set(
    "cosine_neardup_pairs", "quantized_neardup_pairs", "ann_cosine_topk",
    "ann_lsh_topk", "ann_ivf_topk")

  /** ann_lsh_topk / ann_ivf_topk intentionally absent: approximate results,
    * no exact SQL equivalent — driver records the weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "cosine_neardup_pairs" -> cosineNeardupPairsSql,
    "quantized_neardup_pairs" -> quantizedNeardupPairsSql,
    "label_centroids" -> labelCentroidsSql,
    "ann_cosine_topk" -> annCosineTopkSql,
    "multimodal_join" -> multimodalJoinSql
  )
}
