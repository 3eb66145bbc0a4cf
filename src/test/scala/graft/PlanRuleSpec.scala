package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EtlOps
import graft.plans.GraftPlanRules

/** The WindowDedupToMaxBy optimizer rule: plan shape changes (Window+Filter
  * → partial-aggregating max_by) and results stay identical.
  */
class PlanRuleSpec extends AnyFunSuite with SparkFixture {

  test("window dedup rewrites to an aggregate and keeps identical results") {
    GraftPlanRules.install(spark)
    val ev = Tables.events(spark, sf0001)
    val df = EtlOps.latestPerKey(ev, Seq(col("user_id")), Seq(col("ts"), col("event_id")))

    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("max_by"), s"rule must fire:\n$optimized")
    assert(!optimized.contains("Window"), s"window (and group-limit) must be gone:\n$optimized")

    // results identical to the unoptimized window form (fresh session view)
    val expected = ev.collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.maxBy(r => (r.getAs[Long]("ts"), r.getAs[Long]("event_id")))
        .getAs[Long]("event_id")).toMap
    val got = df.select(col("user_id"), col("event_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("rule does NOT fire when the rank column is still referenced") {
    GraftPlanRules.install(spark)
    val ev = Tables.events(spark, sf0001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val df = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("rn")) // rn survives -> not a pure dedup
    assert(df.queryExecution.optimizedPlan.toString.contains("row_number"))
    assert(df.collect().forall(_.getInt(1) === 1))
  }

  test("rule fires for ascending integral keys (bitwise-not inversion), results identical") {
    GraftPlanRules.install(spark)
    val ev = Tables.events(spark, sf0001)
    val df = EtlOps.latestPerKeyOrdered(ev, Seq(col("user_id")),
      Seq(col("ts").asc_nulls_last, col("event_id").asc_nulls_last))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("max_by"), s"rule must fire on integral ASC keys:\n$optimized")
    assert(!optimized.contains("Window"), s"window must be gone:\n$optimized")
    // ascending = EARLIEST (ts, event_id) per user wins
    val expected = ev.collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.minBy(r => (r.getAs[Long]("ts"), r.getAs[Long]("event_id")))
        .getAs[Long]("event_id")).toMap
    val got = df.select(col("user_id"), col("event_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("rule fires for mixed-direction specs (value DESC, event_id ASC), results identical") {
    GraftPlanRules.install(spark)
    val ev = Tables.events(spark, sf0001)
    val df = EtlOps.latestPerKeyOrdered(ev, Seq(col("user_id")),
      Seq(col("ts").desc, col("event_id").asc_nulls_last))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("max_by"), s"rule must fire on mixed specs:\n$optimized")
    assert(!optimized.contains("Window"), s"window must be gone:\n$optimized")
    // latest ts wins; ties broken by SMALLEST event_id
    val expected = ev.collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.minBy(r => (-r.getAs[Long]("ts"), r.getAs[Long]("event_id")))
        .getAs[Long]("event_id")).toMap
    val got = df.select(col("user_id"), col("event_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("rule does NOT fire for a non-integral ascending key (no safe inversion)") {
    GraftPlanRules.install(spark)
    val ev = Tables.events(spark, sf0001)
    val df = EtlOps.latestPerKeyOrdered(ev, Seq(col("user_id")),
      Seq(col("event_type").asc_nulls_last, col("event_id").desc))
    assert(df.queryExecution.optimizedPlan.toString.contains("row_number"))
  }
}
