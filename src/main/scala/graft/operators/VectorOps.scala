package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

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

  /** Σ aᵢ·bᵢ as a fold — sequential association order, deterministic. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

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
    val sims = queries.join(broadcast(cand), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dot(col("qv"), col("cv")) /
          (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("cv"), col("cv")))))
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
    * '02 SimHash for vectors). 8-bit signatures from pseudo-random ±1
    * hyperplanes derived via xxhash64(plane, dim) — deterministic, no stored
    * model. Top-k is computed within each query's bucket only. Approximate →
    * no DuckDB oracle (driver runs the rows>0 check); recall vs the exact
    * variant is asserted in ScalaTest.
    */
  def annLshTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val planes = 8
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))

    // sign bit p of v = sign(Σ_j h(p,j)·v_j) with h ∈ {+1,-1} from xxhash64.
    def signBit(p: Int, v: Column): Column = {
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, j) => x * when(pmod(xxhash64(lit(p), j), lit(2)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    val sigCol = (0 until planes).map(p => signBit(p, col("v"))).reduce(_ + _)
    val bucketed = emb.withColumn("bucket", sigCol)

    val queries = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
    val cand = bucketed
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("bucket").as("cb"))
    val sims = queries.join(cand,
        col("bucket") === col("cb") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) /
          (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("cv"), col("cv")))), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> (annCosineTopk(_, _)),
    "ann_lsh_topk" -> (annLshTopk(_, _)),
    "multimodal_join" -> (multimodalJoin(_, _))
  )

  /** ann_lsh_topk intentionally absent: approximate result, no exact SQL
    * equivalent — driver records the weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "ann_cosine_topk" -> annCosineTopkSql,
    "multimodal_join" -> multimodalJoinSql
  )
}
