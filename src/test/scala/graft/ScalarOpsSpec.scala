package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScalarOps

/** Structural checks for the scalar/aggregation-breadth suite, plus the
  * approx_count_distinct accuracy envelope (HLL sketches differ across
  * engines, so approx aggregates live outside the DuckDB oracle — this is
  * their correctness home).
  */
class ScalarOpsSpec extends AnyFunSuite with SparkFixture {

  test("cube emits all four grouping strata; rollup is a subset") {
    val cube = ScalarOps.cubeOrders(spark, sf0001).collect()
    def strata(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.isNullAt(0), r.isNullAt(1))).toSet
    assert(strata(cube) === Set((false, false), (false, true), (true, false), (true, true)))
    val gs = ScalarOps.groupingSetsOrders(spark, sf0001).collect()
    assert(strata(gs) === Set((false, true), (true, false)))
  }

  test("global top-k returns exactly k rows in strict order") {
    val rows = ScalarOps.topOrdersGlobal(spark, sf0001).collect()
    assert(rows.length === 20)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("union-all keeps duplicates across slices (bag semantics)") {
    val rows = ScalarOps.unionAllSlices(spark, sf0001).collect()
      .map(r => r.getAs[String]("slice") -> r.getAs[Long]("n_rows")).toMap
    val ev = Tables.events(spark, sf0001)
    assert(rows("clicks") === ev.filter(col("event_type") === "click").count())
    assert(rows("big") === ev.filter(col("value") > 250.0).count())
  }

  test("approx_count_distinct within 10% of exact (its non-oracle home)") {
    val ev = Tables.events(spark, sf0001)
    val row = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).collect().head
    val exact = row.getAs[Long]("exact").toDouble
    val approx = row.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact <= 0.10,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentiles_orders: sketch quantiles within 2.5% of exact per group") {
    val approx = ScalarOps.approxPercentilesOrders(spark, sf0001).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Double]("ap50"), r.getAs[Double]("ap90"))).toMap
    val exact = Tables.orders(spark, sf0001).groupBy(col("o_orderpriority"))
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"),
        percentile(col("o_totalprice"), lit(0.9)).as("p90")).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (e50, e90)) =>
      val (a50, a90) = approx(k)
      // the accuracy knob bounds RANK error; on few-hundred-row groups one
      // rank step can move the VALUE ~1%, hence the wider value envelope
      assert(math.abs(a50 - e50) / e50 <= 0.025, s"$k p50: approx=$a50 exact=$e50")
      assert(math.abs(a90 - e90) / e90 <= 0.025, s"$k p90: approx=$a90 exact=$e90")
    }
  }

  test("agg_approx_distinct query: per-group estimates within 5% of exact") {
    val approx = ScalarOps.aggApproxDistinct(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
    val exact = Tables.events(spark, sf0001).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex <= 0.05,
        s"$k: approx=${approx(k)} exact=$ex")
    }
  }

  test("percentile_approx within 5% of exact percentile (its non-oracle home)") {
    val ord = Tables.orders(spark, sf0001)
    val row = ord.agg(
      percentile(col("o_totalprice"), lit(0.5)).as("exact"),
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("approx"))
      .collect().head
    val exact = row.getDouble(0)
    val approx = row.getDouble(1)
    assert(math.abs(approx - exact) / exact <= 0.05, s"approx=$approx exact=$exact")
  }

  test("string funcs agree with plain Scala on a sample") {
    val r = ScalarOps.stringFuncsParts(spark, sf0001).limit(1).collect().head
    val name = Tables.part(spark, sf0001).orderBy("p_partkey")
      .limit(1).collect().head.getAs[String]("p_name")
    assert(r.getAs[String]("name_lower") === name.toLowerCase)
    assert(r.getAs[String]("name_prefix") === name.take(5))
    assert(r.getAs[Int]("name_len") === name.length)
  }
}
