package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function families and aggregation breadth (SURVEY §2.2 rows:
  * string/date/array scalars, distinct aggregates, cube/grouping sets,
  * global sort+limit, union-all). Everything codegen'd built-ins; every
  * query totally ordered for the hash compare.
  */
object ScalarOps {

  /** String scalar family over `part`: lower/upper/substring/concat_ws/
    * length/regexp_extract — one row per part, fully deterministic.
    */
  def stringFuncsParts(spark: SparkSession, sfDir: String): DataFrame = {
    val pt = Tables.part(spark, sfDir)
    pt.select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_name"), "^\\w+", 0).as("first_word"))
      .orderBy(col("p_partkey"))
  }

  val stringFuncsPartsSql: String =
    """SELECT p_partkey,
      |       lower(p_name) AS name_lower,
      |       upper(p_brand) AS brand_upper,
      |       substring(p_name, 1, 5) AS name_prefix,
      |       concat_ws('|', p_brand, p_type) AS brand_type,
      |       length(p_name) AS name_len,
      |       coalesce(regexp_extract(p_name, '^\w+'), '') AS first_word
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Date scalar family: month truncation + extraction over orders. */
  def ordersByMonth(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.select(
        date_trunc("month", col("o_orderdate")).as("month_start"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        col("o_totalprice"))
      .groupBy(col("month_start"), col("yr"), col("mo"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("month_start"))
  }

  val ordersByMonthSql: String =
    """SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
      |       year(o_orderdate) AS yr,
      |       month(o_orderdate) AS mo,
      |       count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS total_price
      |FROM orders
      |GROUP BY 1, 2, 3
      |ORDER BY month_start""".stripMargin

  /** Array scalar family over `documents`: size / slice-head / contains /
    * sorted-distinct — the HOF toolkit on real arrays.
    */
  def arrayFuncsDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val ws = split(col("text"), " ")
    docs.select(
        col("doc_id"),
        size(ws).as("n_tokens"),
        element_at(ws, 1).as("first_token"),
        element_at(ws, -1).as("last_token"),
        array_contains(ws, "the").as("has_the"),
        size(array_distinct(ws)).as("n_distinct_tokens"))
      .orderBy(col("doc_id"))
  }

  val arrayFuncsDocsSql: String =
    """SELECT doc_id,
      |       len(string_split(text, ' ')) AS n_tokens,
      |       string_split(text, ' ')[1] AS first_token,
      |       string_split(text, ' ')[-1] AS last_token,
      |       list_contains(string_split(text, ' '), 'the') AS has_the,
      |       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Distinct-aggregate breadth per event_type: exact distinct counts on two
    * dimensions. (approx_count_distinct is deliberately NOT oracle-compared —
    * HLL sketches differ across engines; its accuracy envelope is asserted
    * in ScalaTest instead.)
    */
  def aggDistinctStats(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(expr("ts div 86400000000000")).as("n_days"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  val aggDistinctStatsSql: String =
    """SELECT event_type,
      |       count(DISTINCT user_id) AS n_users,
      |       count(DISTINCT epoch_ns(ts) // 86400000000000) AS n_days,
      |       count(*) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Cube over (status, priority): all four grouping strata. */
  def cubeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  val cubeOrdersSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Explicit grouping sets: (status) and (priority) strata only. */
  def groupingSetsOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  val groupingSetsOrdersSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Global top-k: orderBy + limit compiles to TakeOrderedAndProject —
    * per-partition heaps + driver merge, never a full global sort.
    */
  def topOrdersGlobal(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val topOrdersGlobalSql: String =
    """SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin

  /** Union-all (reference op #8, `main.py:140` chain): two filtered slices
    * concatenated WITHOUT dedup, then counted — cardinalities prove
    * bag semantics.
    */
  def unionAllSlices(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), lit("clicks").as("slice"))
    val bigValues = ev.filter(col("value") > 250.0)
      .select(col("event_id"), col("user_id"), lit("big").as("slice"))
    clicks.unionByName(bigValues)
      .groupBy(col("slice"))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("event_id")).as("n_distinct_events"))
      .orderBy(col("slice"))
  }

  val unionAllSlicesSql: String =
    """SELECT slice, count(*) AS n_rows, count(DISTINCT event_id) AS n_distinct_events
      |FROM (
      |  SELECT event_id, user_id, 'clicks' AS slice FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT event_id, user_id, 'big' AS slice FROM events WHERE value > 250.0
      |)
      |GROUP BY slice
      |ORDER BY slice""".stripMargin

  /** Collection aggregates: collect_set with a canonical sort — the
    * deterministic form of list aggregation (unsorted collect_list is
    * partition-order-dependent and can never be oracle-compared).
    */
  def aggCollectSets(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.groupBy(col("event_type"))
      .agg(
        // serialized as a CSV string: the driver's checker can't hash raw
        // array cells (pandas factorize chokes on ndarray); the sorted-set
        // semantics are unchanged and the string is engine-portable.
        array_join(sort_array(collect_set(pmod(col("user_id"), lit(10)))), ",").as("user_buckets"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  val aggCollectSetsSql: String =
    """SELECT event_type,
      |       array_to_string(list_sort(list(DISTINCT user_id % 10)), ',') AS user_buckets,
      |       count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Pivot: order counts per priority with status as columns (F/O/P pinned
    * explicitly — an unpinned pivot adds a distinct-values job AND makes the
    * schema data-dependent, both wrong at 100 TB). Pivot-with-count yields
    * null for empty cells; coalesce to 0 to match the oracle's FILTER
    * aggregation.
    */
  def pivotOrdersStatus(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("o_orderpriority"))
  }

  val pivotOrdersStatusSql: String =
    """SELECT o_orderpriority,
      |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Unpivot (melt): the inverse reshape of `pivotOrdersStatus` — wide
    * status-count columns back to (priority, status, n) rows. Narrow,
    * shuffle-free on top of the aggregation that feeds it.
    */
  def unpivotOrdersStatus(spark: SparkSession, sfDir: String): DataFrame = {
    pivotOrdersStatus(spark, sfDir)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("n_f"), col("n_o"), col("n_p")),
        "status", "n")
      .orderBy(col("o_orderpriority"), col("status"))
  }

  val unpivotOrdersStatusSql: String =
    """WITH p AS (
      |  SELECT o_orderpriority,
      |         count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |         count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |         count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, status, n
      |FROM (UNPIVOT p ON n_f, n_o, n_p INTO NAME status VALUE n)
      |ORDER BY o_orderpriority, status""".stripMargin

  /** Exact interpolated percentiles per group: Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition, so
    * rounded money quantiles are oracle-comparable (unlike the approximate
    * `percentile_approx` sketch, which stays out of the oracle like HLL).
    * At 100 TB exact percentile holds per-group sorted state — the approx
    * sketch is the scale path; this declares the exact semantics.
    */
  def percentilesOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.groupBy(col("o_orderpriority"))
      .agg(
        round(percentile(col("o_totalprice"), lit(0.5)), 2).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.9)), 2).as("p90"),
        round(min(col("o_totalprice")), 2).as("p_min"),
        round(max(col("o_totalprice")), 2).as("p_max"))
      .orderBy(col("o_orderpriority"))
  }

  val percentilesOrdersSql: String =
    """SELECT o_orderpriority,
      |       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
      |       round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
      |       round(min(o_totalprice), 2) AS p_min,
      |       round(max(o_totalprice), 2) AS p_max
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Statistical aggregate family: sample stddev / variance / correlation /
    * covariance per return flag — single-pass moment aggregates (partial +
    * final merge, no second data pass). Outputs are rounded at magnitudes
    * that absorb partition-order float noise (~1e-10 relative) while still
    * pinning 6+ significant digits for the cross-engine compare.
    */
  def statsLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")) / 1000, 4).as("covar_k"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag"))
  }

  val statsLineitemSql: String =
    """SELECT l_returnflag,
      |       round(stddev_samp(l_quantity), 4) AS sd_qty,
      |       round(var_samp(l_quantity), 4) AS var_qty,
      |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      |       round(covar_samp(l_quantity, l_extendedprice) / 1000, 4) AS covar_k,
      |       count(*) AS n_items
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Sketch aggregates on the scoreboard: HyperLogLog++ distinct-count
    * estimates per event_type. Declared WITHOUT an oracle entry — HLL
    * register layouts are engine-specific, so DuckDB's estimate is a
    * different number by design; the driver records the rows>0 check and
    * ScalarOpsSpec asserts the ±5% envelope against exact counts. At 100 TB
    * the sketch is the point: mergeable partial state in O(registers)
    * instead of an exact distinct's O(keys) shuffle.
    */
  def aggApproxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** The quantile member of the sketch family (HLL above = distinct
    * counts): per-priority approx_percentile with accuracy 10000 — a
    * mergeable KLL-style sketch whose partial state is O(accuracy),
    * versus the exact `percentile`'s per-group value buffer. No oracle by
    * design (sketch layouts are engine-specific); driver rows>0 check +
    * ScalarOpsSpec pins the envelope against the exact per-group
    * percentiles. At 100 TB the sketch is the point: exact per-group
    * quantiles buffer every value of a group on one task, the sketch
    * merges map-side in constant space.
    */
  def approxPercentilesOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    ord.groupBy(col("o_orderpriority"))
      .agg(
        round(approx_percentile(col("o_totalprice"), lit(0.5), lit(10000)), 2).as("ap50"),
        round(approx_percentile(col("o_totalprice"), lit(0.9), lit(10000)), 2).as("ap90"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_approx_distinct" -> (aggApproxDistinct(_, _)),
    "approx_percentiles_orders" -> (approxPercentilesOrders(_, _)),
    "stats_lineitem" -> (statsLineitem(_, _)),
    "pivot_orders_status" -> (pivotOrdersStatus(_, _)),
    "unpivot_orders_status" -> (unpivotOrdersStatus(_, _)),
    "percentiles_orders" -> (percentilesOrders(_, _)),
    "agg_collect_sets" -> (aggCollectSets(_, _)),
    "string_funcs_parts" -> (stringFuncsParts(_, _)),
    "orders_by_month" -> (ordersByMonth(_, _)),
    "array_funcs_docs" -> (arrayFuncsDocs(_, _)),
    "agg_distinct_stats" -> (aggDistinctStats(_, _)),
    "cube_orders" -> (cubeOrders(_, _)),
    "groupingsets_orders" -> (groupingSetsOrders(_, _)),
    "top_orders_global" -> (topOrdersGlobal(_, _)),
    "unionall_slices" -> (unionAllSlices(_, _))
  )

  def oracleSql: Map[String, String] = Map(
    "stats_lineitem" -> statsLineitemSql,
    "pivot_orders_status" -> pivotOrdersStatusSql,
    "unpivot_orders_status" -> unpivotOrdersStatusSql,
    "percentiles_orders" -> percentilesOrdersSql,
    "agg_collect_sets" -> aggCollectSetsSql,
    "string_funcs_parts" -> stringFuncsPartsSql,
    "orders_by_month" -> ordersByMonthSql,
    "array_funcs_docs" -> arrayFuncsDocsSql,
    "agg_distinct_stats" -> aggDistinctStatsSql,
    "cube_orders" -> cubeOrdersSql,
    "groupingsets_orders" -> groupingSetsOrdersSql,
    "top_orders_global" -> topOrdersGlobalSql,
    "unionall_slices" -> unionAllSlicesSql
  )
}
