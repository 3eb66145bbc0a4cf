package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** x-scale ladder diagnostic for the ingest-time ANN family (VERDICT r15
  * item 3): prints, for one fixture dir, everything the ladder row needs
  * that the bench artifact can't carry —
  *   - the adaptive signature width the rule picks (and therefore whether
  *     the width-boundary rebuild fired vs the previous decade),
  *   - the exact probe-row volume and the shard count the auto-dispatch
  *     derives from it,
  *   - sampled recall@5 of the sharded kernel vs a brute-force exact
  *     batch→corpus scan over `sample` arriving vectors (the full batch
  *     would be a corpus×batch cross product — 3.6T sims at x100; the
  *     per-query independence of the kernel makes a uniform id sample an
  *     unbiased recall estimator).
  *
  * Usage: sbt "runMain graft.AnnScaleDiag <sfDir> [sampleN]"
  */
object AnnScaleDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sampleN = if (args.length > 1) args(1).toInt else 64
    val spark = Verify.session(defaultCpus = "32")
    import spark.implicits._

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val bits = VectorOps.corpusSignatureBits(spark, sfDir)
    val index = graft.pipeline.AnnZone.ensureCorpusLshBuckets(spark, sfDir)
      .select(col("neighbor_id"), col("t").as("ct"), col("b").as("cb"))
    val all = VectorOps.embFrame(spark, sfDir)
    val batch = all.filter(VectorOps.isArrivingVec)
    val batchN = batch.count()
    val volume = VectorOps.probeRowVolume(spark, batch, index, bits)
    val budget = VectorOps.IncrementalAnnProbeBudget
    val shards = math.max(1L, (volume + budget - 1) / budget)
    println(f"[ann-scale] dir=$sfDir n=$n batch=$batchN bits=$bits " +
      f"volume=$volume budget=$budget shards=$shards")

    // recall sample: the `sampleN` smallest arriving ids (deterministic),
    // exact = distributed brute-force cosine top-5 against the corpus
    // (store minus batch — the same population the persisted index holds),
    // with the kernel's (cos DESC, id ASC) tie-break
    val qIds = batch.select("vec_id").orderBy("vec_id").limit(sampleN)
      .as[Long].collect().toSet
    val q = batch.filter(col("vec_id").isInCollection(qIds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // ADVICE r16: a zero-norm corpus vector scores cos = 0/0 = NaN, and NaN
    // sorts GREATEST under desc ordering in Spark — such vectors would
    // occupy the exact top-5 and silently deflate the sampled recall. Drop
    // them from the exact side (mirrors VectorOps.ivfqQuantized's guard;
    // the generator's fixtures currently have none, so this is insurance).
    val corpus = all.filter(!VectorOps.isArrivingVec)
      .filter(expr("aggregate(v, 0D, (acc, x) -> acc + abs(x))") > 0)
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv"))
    val dot = expr(
      "aggregate(zip_with(qv, cv, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")
    val nq = expr("sqrt(aggregate(qv, 0D, (acc, x) -> acc + x * x))")
    val nc = expr("sqrt(aggregate(cv, 0D, (acc, x) -> acc + x * x))")
    val scored = corpus.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"), (dot / (nq * nc)).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    val exact = scored
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val approx = VectorOps.incrementalAnnTopk(spark, sfDir)
      .filter(col("query_id").isInCollection(qIds))
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall =
      if (exact.isEmpty) 1.0
      else exact.intersect(approx).size.toDouble / exact.size
    println(f"[ann-scale] sampled_recall@5=$recall%.3f over ${qIds.size} " +
      f"arriving queries (exact ${exact.size} pairs, kernel ${approx.size})")
    spark.stop()
  }
}
