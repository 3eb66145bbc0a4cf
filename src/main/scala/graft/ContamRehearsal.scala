package graft

import java.util.Locale
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.operators.TextOps

/** Two-eval-release amortization rehearsal for the contamination index
  * (VERDICT r12 item 6).
  *
  * The r12 round honestly recorded `contamination_index_pairs` as
  * compute-PARITY with the cold path at 10× scale on one screening run —
  * the index's value claim was amortization across eval RELEASES, which a
  * single-release board cannot show. This main measures that claim
  * directly: two disjoint eval releases (id-bucket slices 90–94 and
  * 95–99 of the test split) each screened twice —
  *
  *   - COLD: the [[TextOps.decontaminationPairs]] shape, re-tokenizing the
  *     ENTIRE training corpus inline per release;
  *   - INDEX: the [[TextOps.contaminationIndexPairs]] shape, probing the
  *     persisted [[graft.pipeline.DedupZone.ensureTrainPostings]] artifact
  *     — whose one-time build cost is also measured here, fresh (the
  *     artifact dir is deleted first), so the ledger shows the full
  *     amortization arithmetic: build + k·probe vs k·(tokenize+probe).
  *
  * Both paths run the same [[TextOps.containmentPairs]] kernel via
  * [[TextOps.contaminationScreen]], so this measures the real dispatch.
  * Output: one JSON line of Σ executor-CPU (and wall) per phase; the
  * numbers land in BASELINE.md's rehearsal table.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32
  *        sbt "runMain graft.ContamRehearsal"
  */
object ContamRehearsal {

  private final class Tally extends SparkListener {
    val cpuNs = new AtomicLong(0L)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) cpuNs.addAndGet(m.executorCpuTime)
    }
  }

  def main(args: Array[String]): Unit = {
    Locale.setDefault(Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tally = new Tally
    spark.sparkContext.addSparkListener(tally)
    def measure(label: String)(act: => Long): (Double, Double, Long) = {
      spark.catalog.clearCache(); System.gc()
      val c0 = tally.cpuNs.get
      val t0 = System.nanoTime()
      val rows = act
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener-bus drain, coarse but outside the next phase
      val cpu = (tally.cpuNs.get - c0) / 1e9
      System.err.println(f"[contam-rehearsal] $label%-12s wall=$wall%7.2f cpu=$cpu%7.2f rows=$rows")
      (cpu, wall, rows)
    }

    // fresh one-time index build: delete the committed artifact so the
    // ensure actually builds (target/ debris only; the next consumer would
    // rebuild it identically)
    val postingsDir = new java.io.File(
      s"${graft.pipeline.DedupZone.zoneDir(sfDir)}/train_postings")
    org.apache.commons.io.FileUtils.deleteQuietly(postingsDir)
    val build = measure("build") {
      graft.pipeline.DedupZone.ensureTrainPostings(spark, sfDir).count()
    }
    // release A = test buckets 90–94, release B = 95–99 (disjoint halves
    // of the standard test split — Splits.bucket is the engine-wide id
    // hash, so each slice is a stable, reproducible "release")
    val coldA = measure("cold_A") {
      TextOps.contaminationScreen(spark, sfDir, 90, 95, useIndex = false).count()
    }
    val coldB = measure("cold_B") {
      TextOps.contaminationScreen(spark, sfDir, 95, 100, useIndex = false).count()
    }
    val idxA = measure("index_A") {
      TextOps.contaminationScreen(spark, sfDir, 90, 95, useIndex = true).count()
    }
    val idxB = measure("index_B") {
      TextOps.contaminationScreen(spark, sfDir, 95, 100, useIndex = true).count()
    }
    spark.sparkContext.removeSparkListener(tally)

    def j(v: (Double, Double, Long)): String =
      f"""{"cpu":${v._1}%.2f,"wall":${v._2}%.2f,"rows":${v._3}}"""
    println(
      s"""{"contam_rehearsal":{"sf":"${sfDir.split('/').last}","build":${j(build)},""" +
        s""""cold_A":${j(coldA)},"cold_B":${j(coldB)},""" +
        s""""index_A":${j(idxA)},"index_B":${j(idxB)}}}""")
    spark.stop()
  }
}
