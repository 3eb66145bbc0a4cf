package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Physical-plan shape assertions for the multi-join queries — the
  * properties that matter at 100 TB, pinned so a refactor cannot silently
  * regress them: filters reach the parquet scans (PushedFilters), scans read
  * only the referenced columns, tiny dims broadcast, global top-k plans as
  * TakeOrderedAndProject (never a global sort), and no CartesianProduct
  * appears anywhere.
  */
class PlanShapeSpec extends AnyFunSuite with SparkFixture {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("Q3 shape: pushed filters, pruned lineitem scan, TakeOrderedAndProject") {
    val df = Relational.revenueTopOrders(spark, sf0001)
    val plan = executedPlan(df)
    assert(plan.contains("TakeOrderedAndProject"), s"global top-10 must not sort globally:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // every scan-level filter must be pushed into its parquet reader
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate")
      || plan.contains("PushedFilters: [GreaterThan(l_shipdate"), s"lineitem filter not pushed:\n$plan")
    assert(plan.contains("LessThan(o_orderdate"), s"orders filter not pushed:\n$plan")
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"), s"customer filter not pushed:\n$plan")
    // column pruning: the lineitem read schema carries exactly the 4 used cols
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"),
      s"lineitem scan must read only the referenced columns:\n$plan")
  }

  test("engine-wide: no declared query plans a CartesianProduct") {
    // builds every registered query's physical plan on sf0.001 (a handful of
    // queries run eager guard/convergence jobs during construction — cheap
    // at this SF) and asserts the one join shape that must never appear:
    // an unconditioned cartesian. Pair-enumeration queries use broadcast
    // joins with inequality conditions (BroadcastNestedLoopJoin), which is
    // the intended bounded form.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
    }
  }

  test("Q5 shape: tiny dims broadcast, date filter pushed, no cartesian") {
    val df = Relational.regionalRevenue(spark, sf0001)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"), s"nation/region must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("EqualTo(r_name,ASIA)"), s"region filter not pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("LessThan(o_orderdate"), s"orders date range not pushed:\n$plan")
  }
}
