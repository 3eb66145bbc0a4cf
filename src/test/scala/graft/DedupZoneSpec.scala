package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps
import graft.pipeline.DedupZone

/** The materialized dedup-artifact zone (VERDICT r10 item 1a): artifacts
  * must equal their cold computations row-for-row, and a fresh `ensure` on
  * an up-to-date zone must REUSE the files on disk — the entire point is
  * that downstream consumers stop re-running the Jaccard+CC / detection
  * pipelines per query.
  */
class DedupZoneSpec extends AnyFunSuite with SparkFixture {

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  /** Resolve the zone's CURRENT version dir through the r15 pointer layout
    * (highest-sequence `_GRAFT_PTR.*` names the live version subdir) — the
    * spec reads the layout directly so a layout change breaks here, loudly.
    */
  private def currentVersion(dir: String): String = {
    val s = Files.list(Paths.get(dir))
    val ptr = try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith("_GRAFT_PTR."))
      .toSeq.maxBy(_.getFileName.toString)
    finally s.close()
    s"$dir/${Files.readString(ptr).trim}"
  }

  private def parquetMtimes(dir: String): Map[String, Long] = {
    val vdir = currentVersion(dir)
    val s = Files.list(Paths.get(vdir))
    try s.iterator().asScala
      .filter(f => f.getFileName.toString.endsWith(".parquet"))
      .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f).toMillis)
      .toMap
    finally s.close()
  }

  test("clusters artifact equals the cold dedupClusters computation") {
    val zone = DedupZone.ensureClusters(spark, sf0001)
    val cold = TextOps.dedupClusters(spark, sf0001)
    assert(rowSet(zone) === rowSet(cold),
      "the materialized cluster assignment must be the cold CC result")
  }

  test("incremental cluster merge equals the full-recompute CC (VERDICT r11 item 3)") {
    // the merge path: corpus-subset assignment + delta-pair min-label union
    val merged = TextOps.incrementalClusterStats(spark, sf0001)
    // the full recompute over the whole store
    val full = TextOps.dedupClusters(spark, sf0001)
    assert(rowSet(merged) === rowSet(full),
      "the delta merge must reproduce full-recompute components AND reps exactly")
    // the merge actually has work to do at this SF: some arriving-batch doc
    // must participate in a near-dup pair, otherwise this test pins nothing
    val batchPaired = DedupZone.ensurePairs(spark, sf0001)
      .filter(graft.operators.Splits.saltedBucket("",
          org.apache.spark.sql.functions.col("doc_a")) >= graft.operators.Splits.ValMax ||
        graft.operators.Splits.saltedBucket("",
          org.apache.spark.sql.functions.col("doc_b")) >= graft.operators.Splits.ValMax)
      .count()
    assert(batchPaired > 0, "fixture must exercise the delta-merge path")
  }

  test("contamination artifact equals the cold decontaminationPairs computation") {
    val zone = DedupZone.ensureContamination(spark, sf0001)
    val cold = TextOps.decontaminationPairs(spark, sf0001)
    assert(rowSet(zone) === rowSet(cold))
  }

  test("LSH index artifact equals the cold corpusLshIndex computation") {
    val zone = DedupZone.ensureLshIndex(spark, sf0001)
    val cold = TextOps.corpusLshIndex(spark, sf0001)
    assert(rowSet(zone.drop("sh")) === rowSet(cold.drop("sh")))
    // every rep carries its never-capped identity rung
    assert(zone.filter("band = -1").count() ===
      zone.select("lang", "rep").distinct().count())
  }

  test("an up-to-date zone is served from disk, never rebuilt (untouched mtimes)") {
    DedupZone.ensureClusters(spark, sf0001) // build (or confirm built)
    val clustersDir = s"${DedupZone.zoneDir(sf0001)}/clusters"
    val pairsDir = s"${DedupZone.zoneDir(sf0001)}/pairs"
    val before = (parquetMtimes(clustersDir), parquetMtimes(pairsDir))
    Thread.sleep(1100L) // mtime granularity guard
    DedupZone.ensureClusters(spark, sf0001).count()
    assert((parquetMtimes(clustersDir), parquetMtimes(pairsDir)) === before,
      "a second ensure on an up-to-date zone must not rewrite any artifact")
  }

  test("a stale fingerprint forces a rebuild") {
    DedupZone.ensureContamination(spark, sf0001)
    val dir = s"${DedupZone.zoneDir(sf0001)}/contamination"
    val v0 = currentVersion(dir)
    Files.writeString(Paths.get(v0, "_GRAFT_SRC"), "stale-on-purpose")
    DedupZone.ensureContamination(spark, sf0001).count()
    // the rebuild witness is a NEW current version carrying the true
    // fingerprint (the stale version stays on disk as the retained
    // previous — r15 pointer layout; only a build commits a new pointer)
    val v1 = currentVersion(dir)
    assert(v1 !== v0, "a stale fingerprint must force a rebuild (new version)")
    assert(Files.readString(Paths.get(v1, "_GRAFT_SRC")) !== "stale-on-purpose",
      "the rebuilt version must carry the true fingerprint")
  }

  test("ANN zone: IVF artifacts are reused on a fresh ensure (untouched mtimes)") {
    import graft.pipeline.AnnZone
    AnnZone.ensureIvfLists(spark, sf0001).count()
    val cDir = s"${AnnZone.zoneDir(sf0001)}/ivf_centroids"
    val lDir = s"${AnnZone.zoneDir(sf0001)}/ivf_lists"
    val before = (parquetMtimes(cDir), parquetMtimes(lDir))
    Thread.sleep(1100L)
    AnnZone.ensureIvfLists(spark, sf0001).count()
    assert((parquetMtimes(cDir), parquetMtimes(lDir)) === before,
      "a second ensure on an up-to-date ANN zone must not rebuild the index")
  }

  test("ANN zone: LSH posting artifact is id-only (no vectors) and reused") {
    import graft.pipeline.AnnZone
    val idx = AnnZone.ensureLshBuckets(spark, sf0001)
    assert(idx.schema.fieldNames.sorted === Seq("b", "neighbor_id", "t"),
      "the LSH index must carry postings only — vectors live in the corpus")
    val dir = s"${AnnZone.zoneDir(sf0001)}/lsh_buckets"
    val before = parquetMtimes(dir)
    Thread.sleep(1100L)
    AnnZone.ensureLshBuckets(spark, sf0001).count()
    assert(parquetMtimes(dir) === before,
      "a second ensure on an up-to-date LSH index must not rebuild it")
  }

  test("consumers read the zone: cluster_representatives' survivor totals " +
      "match the artifact's cluster count") {
    val nClusters = DedupZone.ensureClusters(spark, sf0001)
      .select("cluster_rep").distinct().count()
    val reps = TextOps.clusterRepresentatives(spark, sf0001)
    assert(reps.count() === nClusters)
  }
}
