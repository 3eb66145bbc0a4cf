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
}
