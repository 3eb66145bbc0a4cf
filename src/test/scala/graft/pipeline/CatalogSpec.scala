package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The session-catalog surface: every base table and committed zone
  * artifact must be addressable from spark.sql under its registered name,
  * and SQL over the views must equal the API path over the same zones.
  */
class CatalogSpec extends AnyFunSuite with SparkFixture {

  test("registerAll exposes base tables AND zone artifacts to spark.sql; " +
      "SQL over the views equals the API path") {
    val names = Catalog.registerAll(spark, sf0001)
    // every promised view resolves
    names.foreach { n =>
      assert(spark.catalog.tableExists(n), s"view $n not registered")
    }
    // base table through SQL == through the reader API
    assert(spark.sql("SELECT count(*) FROM documents").first().getLong(0) ===
      graft.Tables.documents(spark, sf0001).count())
    // zone artifact through SQL == through the zone API
    assert(spark.sql("SELECT count(*) FROM dedup_clusters").first().getLong(0) ===
      DedupZone.ensureClusters(spark, sf0001).count())
    // a cross-relation query joining a ZONE view to a BASE view — the whole
    // point of the catalog surface — agrees with the DataFrame form
    val sqlCounts = spark.sql(
      """SELECT d.lang, count(*) AS n FROM dedup_clusters c
        |JOIN documents d ON c.doc_id = d.doc_id
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val apiCounts = DedupZone.ensureClusters(spark, sf0001)
      .join(graft.Tables.documents(spark, sf0001), "doc_id")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sqlCounts === apiCounts)
    // re-registration is idempotent (createOrReplaceTempView semantics)
    Catalog.registerAll(spark, sf0001)
    assert(spark.sql("SELECT count(*) FROM bm25_postings").first().getLong(0) > 0L)
  }

  test("ensureFresh = false registers committed zones WITHOUT building " +
      "anything, and skips uncommitted ones (VERDICT r13 item 6)") {
    // all-committed case: the zones exist from the test above / prebuild —
    // a no-build registration must serve them with zero builds
    Catalog.registerAll(spark, sf0001) // make every zone committed
    val before = ZoneBuildTally.builds.get
    val names = Catalog.registerAll(spark, sf0001, ensureFresh = false)
    assert(ZoneBuildTally.builds.get === before,
      "a no-build registration must never trigger a zone build")
    assert(names.contains("dedup_clusters") && names.contains("bm25_postings"),
      "committed zones must be registered in no-build mode")
    assert(spark.sql("SELECT count(*) FROM dedup_clusters").first().getLong(0) > 0L)
    // uncommitted case: a scale dir whose zones were never built — base
    // tables register, zone views are absent rather than force-built
    val bare = "target/catalogspec-nobuild-sf"
    val bareDir = new java.io.File(bare)
    org.apache.commons.io.FileUtils.deleteQuietly(bareDir)
    bareDir.mkdirs()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      java.nio.file.Files.copy(
        new java.io.File(sf0001, s"$t.parquet").toPath,
        new java.io.File(bareDir, s"$t.parquet").toPath)
    val bareNames = Catalog.registerAll(spark, bare, ensureFresh = false)
    assert(ZoneBuildTally.builds.get === before,
      "no-build registration over a bare dir must not build either")
    assert(bareNames.contains("documents") && !bareNames.contains("dedup_pairs"),
      "uncommitted zones must be SKIPPED, not built")
    // restore the sf0.001 views clobbered by the bare-dir registration
    Catalog.registerAll(spark, sf0001)
  }

  test("no-build registration skips a committed-but-STALE zone instead of " +
      "serving it (ADVICE r14 #3 — the never-serve-stale doctrine)") {
    val dirName = "target/catalogspec-stale-sf"
    val d = new java.io.File(dirName)
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.mkdirs()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      java.nio.file.Files.copy(
        new java.io.File(sf0001, s"$t.parquet").toPath,
        new java.io.File(d, s"$t.parquet").toPath)
    // commit ONE zone over the copy, then regenerate its source
    DedupZone.ensurePairs(spark, dirName)
    val committed = Catalog.registerAll(spark, dirName, ensureFresh = false)
    assert(committed.contains("dedup_pairs"),
      "the committed, FRESH zone must register in no-build mode")
    val src = new java.io.File(d, "documents.parquet")
    assert(src.setLastModified(src.lastModified() + 5000)) // "regenerated"
    val before = ZoneBuildTally.builds.get
    val stale = Catalog.registerAll(spark, dirName, ensureFresh = false)
    assert(ZoneBuildTally.builds.get === before, "no-build means NO build")
    assert(!stale.contains("dedup_pairs"),
      "a committed-but-stale zone must be skipped in no-build mode, " +
        "never silently served")
    Catalog.registerAll(spark, sf0001) // restore the shared views
  }

  test("an ArtifactZone rebuild RE-BINDS the registered view: query, " +
      "rebuild, query again — both green, and the view scans the NEW " +
      "version (VERDICT r14 item 7)") {
    Catalog.registerAll(spark, sf0001)
    val n0 = spark.sql("SELECT count(*) FROM dedup_pairs").first().getLong(0)
    assert(n0 > 0L)
    // force a REBUILD from nothing: wipe the whole artifact (pointers +
    // every retained version) — exactly the case that stranded a
    // registered view on deleted files before the commit listener
    val zone = new java.io.File(s"${DedupZone.zoneDir(sf0001)}/pairs")
    org.apache.commons.io.FileUtils.deleteQuietly(zone)
    DedupZone.ensurePairs(spark, sf0001) // rebuild + commit fires the listener
    val newVersion = ArtifactZone.resolve(zone.getPath).get
    val viewFiles = spark.sql("SELECT * FROM dedup_pairs").inputFiles
    assert(viewFiles.nonEmpty && viewFiles.forall(_.contains(
        new java.io.File(newVersion).getName)),
      "the re-bound view must scan the freshly committed version dir")
    assert(spark.sql("SELECT count(*) FROM dedup_pairs").first().getLong(0) === n0,
      "the post-rebuild query must be green with the same answer")
  }
}
