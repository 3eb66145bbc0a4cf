package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** IVFQ zone-build cost ladder (VERDICT r16 item 4 done-bar): times the
  * `ann_ivfq_topk` posting-list ZONE BUILD from scratch at each given
  * fixture dir and prints n, K, the n·K assignment-sim volume, build wall
  * and summed executor CPU — the receipt that the closure-assignment scan
  * grows SUB-QUADRATICALLY after the r17 √n K rule (K = max(16, ⌈√n⌉), so
  * sims = n^1.5; the r16 constant-256-cell rule priced the same ladder at
  * n²/256). Unregistered diagnostic, not a query path — the bounded
  * `collect`-free build runs through the ordinary
  * [[graft.pipeline.AnnZone.ensureIvfqLists]] ensure.
  *
  * Usage: sbt "runMain graft.IvfqScaleDiag <fixtureDir> [<fixtureDir>...]"
  * (e.g. target/scaledata/x10 x30 x100). The fixture's ivfq_lists artifact
  * is DELETED first so the measurement is the build itself, never a
  * freshness probe over a prior round's artifact.
  */
object IvfqScaleDiag {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfqScaleDiag <fixtureDir>...")
    val spark = Verify.session(defaultCpus = "32")
    val cpuNs = new AtomicLong(0L)
    val tally = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) cpuNs.addAndGet(m.executorCpuTime): Unit
      }
    }
    spark.sparkContext.addSparkListener(tally)
    args.foreach { dir =>
      val artifactDir = new java.io.File(
        s"${graft.pipeline.AnnZone.zoneDir(dir)}/ivfq_lists")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(): Unit
      }
      rm(artifactDir)
      val n = Tables.embeddings(spark, dir).count()
      val k = graft.operators.VectorOps.ivfqK(n)
      cpuNs.set(0L)
      val t0 = System.nanoTime()
      graft.pipeline.AnnZone.ensureIvfqLists(spark, dir, Some(n))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain: stragglers land before read
      println(f"[ivfq-scale] dir=$dir n=$n k=$k sims=${n * k} " +
        f"build_wall=$wall%.2f s build_cpu=${cpuNs.get / 1e9}%.2f s")
      // recall@5 of the declared IVFQ query vs a brute-force float-exact
      // top-5 over the 10 declared queries (10·n sims — cheap at any n,
      // unlike the gated all-pairs oracle form): the quality number the
      // K rule must not silently sink as the probed fraction 4/√n shrinks
      import org.apache.spark.sql.functions._
      val emb = graft.operators.VectorOps.embFrame(spark, dir)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val corpus = emb
        .filter(expr("aggregate(v, 0D, (acc, x) -> acc + abs(x))") > 0)
        .select(col("vec_id").as("neighbor_id"), col("v").as("cv"))
      val dot = expr(
        "aggregate(zip_with(qv, cv, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")
      val nq = expr("sqrt(aggregate(qv, 0D, (acc, x) -> acc + x * x))")
      val nc = expr("sqrt(aggregate(cv, 0D, (acc, x) -> acc + x * x))")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      val exact = corpus.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), (dot / (nq * nc)).as("cos"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = graft.operators.VectorOps.annIvfqTopk(spark, dir)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall =
        if (exact.isEmpty) 1.0
        else exact.intersect(approx).size.toDouble / exact.size
      println(f"[ivfq-scale] dir=$dir recall@5=$recall%.3f " +
        f"(exact ${exact.size} pairs, ivfq ${approx.size})")
    }
    spark.stop()
  }
}
