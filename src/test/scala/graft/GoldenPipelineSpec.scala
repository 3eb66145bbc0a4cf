package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.RawZone

/** End-to-end golden test of the reference pipeline semantics
  * (`/root/reference/main.py:179-185`, golden contracts
  * `test_main.py:203-222` dedup order and `test_main.py:314-317` CSV bytes):
  * raw zone in the reference's literal `{repo}/{ts}/runs/{id}.json` layout →
  * glob scan + path-partition parse → latest-per-key dedup → nested→flat
  * projection → header CSV with null→empty.
  */
class GoldenPipelineSpec extends AnyFunSuite with SparkFixture {

  private def writeRun(base: Path, repo: String, ts: String, runId: Long, json: String): Unit = {
    val dir = base.resolve(repo).resolve(ts).resolve("runs")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(s"$runId.json"), json)
  }

  private def runJson(id: Long, repo: String, status: String, conclusion: Option[String]): String = {
    val conc = conclusion.map(c => s""""$c"""").getOrElse("null")
    s"""{"id": $id, "name": "My Workflow", "head_sha": 12345678, "status": "$status",
       | "conclusion": $conc, "created_at": "2025-01-01T00:00:00Z",
       | "updated_at": "2025-01-01T00:00:00Z", "run_started_at": "2025-01-01T00:00:00Z",
       | "repository": {"name": "$repo"}}""".stripMargin.replaceAll("\n", "")
  }

  test("latest snapshot wins per run id and CSV bytes match the reference contract") {
    val base = Files.createTempDirectory("graft_golden")
    // run 1 extracted twice: the newer snapshot (completed/success) must win
    writeRun(base, "test_repo", "20250101-000000Z", 1, runJson(1, "test_repo", "pending", None))
    writeRun(base, "test_repo", "20250102-000000Z", 1, runJson(1, "test_repo", "completed", Some("success")))
    // run 2 extracted once, null conclusion → empty CSV cell
    writeRun(base, "test_repo", "20250101-000000Z", 2, runJson(2, "test_repo", "pending", None))

    val lake = RawZone.readReferenceRunsLake(spark, base.toString, RawZone.workflowRunSchema)
    assert(lake.count() === 3)

    val flat = RawZone.transformWorkflowRuns(lake).orderBy(col("id"))
    val rows = flat.collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("status") === "completed") // newest snapshot won
    assert(rows(0).getAs[String]("conclusion") === "success")
    assert(rows(1).getAs[String]("conclusion") === null)

    val outDir = Files.createTempDirectory("graft_csv")
    RawZone.writeWorkflowCsv(flat, outDir.toString)
    val csvFile = Files.list(outDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".csv")).toSeq.head
    val lines = Files.readAllLines(csvFile).asScala

    // FIXTURES §A.3 byte contract: exact header, null conclusion → empty field
    assert(lines.head === "id,repo,name,head_sha,status,conclusion,created_at,updated_at,run_started_at")
    assert(lines(1) === "1,test_repo,My Workflow,12345678,completed,success,2025-01-01T00:00:00Z,2025-01-01T00:00:00Z,2025-01-01T00:00:00Z")
    assert(lines(2) === "2,test_repo,My Workflow,12345678,pending,,2025-01-01T00:00:00Z,2025-01-01T00:00:00Z,2025-01-01T00:00:00Z")
  }

  test("written CSV reads back through the schema-pinned CSV source") {
    val base = Files.createTempDirectory("graft_csvsrc")
    writeRun(base, "test_repo", "20250101-000000Z", 1, runJson(1, "test_repo", "pending", None))
    val flat = RawZone.transformWorkflowRuns(
      RawZone.readReferenceRunsLake(spark, base.toString, RawZone.workflowRunSchema))
    val outDir = Files.createTempDirectory("graft_csv_rt")
    RawZone.writeWorkflowCsv(flat, outDir.toString)

    val back = spark.read
      .schema(org.apache.spark.sql.types.StructType(flat.schema.fields.map(_.copy(nullable = true))))
      .option("header", "true").option("nullValue", "")
      .csv(outDir.toString)
    val row = back.collect().head
    assert(back.count() === 1)
    assert(row.getAs[Long]("id") === 1L)
    assert(row.getAs[String]("conclusion") === null) // empty cell -> null
  }

  test("multicast/tee: one persisted plan feeds two consumers (op #9)") {
    val ev = Tables.events(spark, sf0001).persist()
    try {
      val byType = ev.groupBy(org.apache.spark.sql.functions.col("event_type")).count().count()
      val byUser = ev.groupBy(org.apache.spark.sql.functions.col("user_id")).count().count()
      assert(byType > 0 && byUser > 0)
    } finally ev.unpersist()
  }

  test("multi-repo lake unions across repo partitions (op #16)") {
    val base = Files.createTempDirectory("graft_multi")
    writeRun(base, "repo_a", "20250101-000000Z", 10, runJson(10, "repo_a", "pending", None))
    writeRun(base, "repo_b", "20250101-000000Z", 20, runJson(20, "repo_b", "queued", None))

    val flat = RawZone.transformWorkflowRuns(
      RawZone.readReferenceRunsLake(spark, base.toString, RawZone.workflowRunSchema))
    val repos = flat.select("repo").orderBy("repo").collect().map(_.getString(0)).toSeq
    assert(repos === Seq("repo_a", "repo_b"))
  }
}
