package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the 100 TB answer for repeated fact⋈fact joins: both tables
  * pre-hashed into the same bucket layout on the join key, so the sort-merge
  * join needs NO shuffle exchange at read time. This spec materializes
  * bucketed copies of orders/lineitem and proves the exchange disappears
  * from the physical plan (vs the plain-parquet join, which must shuffle
  * both sides).
  */
class BucketingSpec extends AnyFunSuite with SparkFixture {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // one-time layout cost: write both facts bucketed by the join key
    // (default warehouse dir; tables dropped at the end)
    Tables.orders(spark, sf0001).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, sf0001).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$plan")

    // and it computes the same result as the plain join
    val expected = Tables.orders(spark, sf0001)
      .join(Tables.lineitem(spark, sf0001), col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(joined.count() === expected)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
