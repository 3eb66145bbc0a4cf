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
    // column pruning: the 4 referenced lineitem columns are read and the
    // unreferenced wide ones are not. Asserted per-column rather than as one
    // exact ReadSchema struct string, which was brittle across Spark
    // versions' type spellings / field ordering (ADVICE r6).
    Seq("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate").foreach { c =>
      assert(plan.contains(c), s"lineitem scan must read $c:\n$plan")
    }
    Seq("l_quantity", "l_tax", "l_returnflag", "l_linestatus").foreach { c =>
      assert(!plan.contains(c), s"lineitem scan must not read unused column $c:\n$plan")
    }
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

  /** Builds a query's physical plan with auto-broadcast DISABLED, so the
    * only BroadcastExchanges left are the ones the engine explicitly hints —
    * the property under test for the near-dup/ANN family. (With the default
    * threshold, tiny-SF size estimates let Catalyst broadcast sides the
    * engine deliberately shuffles at scale, which would mask a regression.)
    */
  private def planNoAutoBroadcast(name: String): String =
    planNoAutoBroadcastOf(SparkEntry.queries(name)(spark, sf0001))

  private def planNoAutoBroadcastOf(df: => org.apache.spark.sql.DataFrame): String = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try df.queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("training_manifest_stats: the plan reads zone artifacts, never " +
      "recomputes detection, and the packing window is lang-partitioned") {
    // build the zones first so the plan resolves the parquet artifacts
    graft.pipeline.DedupZone.ensureClusters(spark, sf0001).count()
    graft.pipeline.DedupZone.ensureContamination(spark, sf0001).count()
    val plan = planNoAutoBroadcast("training_manifest_stats")
    val zoneScans = "dedupzone".r.findAllIn(plan).size
    assert(zoneScans >= 2,
      s"expected parquet scans of both dedup-zone artifacts, saw $zoneScans:\n$plan")
    // a detection recompute would surface as the shingle Generate/posexplode
    // subtree; the manifest must carry none of it
    assert(!plan.contains("Generate"),
      s"no explode subtree may appear — detection must come from the zone:\n$plan")
    assert(plan.contains("Window"), s"expected the packing window:\n$plan")
    assert(plan.toLowerCase.contains("windowspecdefinition(lang"),
      s"the packing window must be lang-partitioned (never global):\n$plan")
  }

  test("ann_cosine_topk: the broadcast side is the 10-row query set, not the corpus") {
    val plan = planNoAutoBroadcast("ann_cosine_topk")
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected a broadcast join:\n$plan")
    val idx = plan.indexOf("BroadcastExchange")
    assert(idx >= 0, s"expected exactly one explicit broadcast:\n$plan")
    // the broadcast subtree is printed below the exchange node; the query-set
    // scan carries the pushed vec_id < 10 filter, the full corpus would not
    assert(plan.substring(idx).contains("LessThan(vec_id,10)"),
      s"broadcast side must be the filtered query set:\n$plan")
    assert(plan.indexOf("BroadcastExchange", idx + 1) < 0,
      s"only the query set may broadcast:\n$plan")
  }

  test("hard_negative_pairs: the broadcast side is the 10-row anchor set, not the corpus") {
    // same orientation contract as ann_cosine_topk — the mining scan must
    // stream the candidate corpus and broadcast only the anchors
    val plan = planNoAutoBroadcast("hard_negative_pairs")
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected a broadcast join:\n$plan")
    val idx = plan.indexOf("BroadcastExchange")
    assert(idx >= 0, s"expected exactly one explicit broadcast:\n$plan")
    assert(plan.substring(idx).contains("LessThan(vec_id,10)"),
      s"broadcast side must be the filtered anchor set:\n$plan")
    assert(plan.indexOf("BroadcastExchange", idx + 1) < 0,
      s"only the anchor set may broadcast:\n$plan")
  }

  test("ann_ivf_topk: no Window operator — argmax/top-k run as partial aggregates") {
    val plan = planNoAutoBroadcast("ann_ivf_topk")
    assert(!plan.contains("Window"), s"IVF must not plan a window:\n$plan")
    assert(plan.contains("TopKByScore"), s"expected the bounded-heap top-k aggregate:\n$plan")
  }

  test("incremental_ann_topk: the probe dedup carries THIN id-only rows, never " +
      "the query vector (r12 — the 50x-shuffle-bytes regression guard)") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val plan = graft.operators.VectorOps.incrementalAnnTopk(spark, sf0001)
      .queryExecution.optimizedPlan
    // dropDuplicates(query_id, neighbor_id) optimizes to an Aggregate whose
    // grouping AND output are exactly the two ids — if a vector column ever
    // rides through the probe join again, the output widens and this fails
    val dedups = plan.collect {
      case a: Aggregate if a.groupingExpressions.size == 2 &&
        a.output.map(_.name).toSet == Set("query_id", "neighbor_id") => a
    }
    assert(dedups.nonEmpty,
      "the candidate dedup must group on exactly (query_id, neighbor_id)")
    dedups.foreach { a =>
      val childCols = a.child.output.map(_.name)
      assert(childCols.toSet == Set("query_id", "neighbor_id"),
        s"probe rows entering the dedup must be id-only, got $childCols")
    }
  }

  test("ann_lsh_topk: bucket-probe join shuffles; top-k is the partial aggregate") {
    val plan = planNoAutoBroadcast("ann_lsh_topk")
    assert(plan.contains("TopKByScore"), s"expected the bounded-heap top-k aggregate:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"bucket join must shuffle on (table, bucket):\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"an unconditioned broadcast join would be the all-pairs regression:\n$plan")
  }

  test("neardup_jaccard_pairs: hinted broadcasts are bare-ID semi-reductions only, " +
      "and vanish above the candidate budget") {
    val plan = planNoAutoBroadcast("neardup_jaccard_pairs")
    assert(plan.contains("SortMergeJoin"), s"prefix-postings join must shuffle:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"an unconditioned broadcast join would be the all-pairs regression:\n$plan")
    // VERDICT r7 item 4: the old shape broadcast candidates JOINED WITH their
    // shingle arrays — unbounded on a high-dup corpus. Now the only hinted
    // broadcasts are the two LeftSemi docs-side reductions whose payload is a
    // bare candidate-ID set; the verify joins themselves carry no hint.
    val n = "BroadcastExchange".r.findAllIn(plan).size
    assert(n == 2, s"expected the 2 id-set semi-reduction broadcasts, saw $n:\n$plan")
    val semi = "LeftSemi".r.findAllIn(plan).size
    assert(semi == 2, s"expected 2 LeftSemi docs reductions, saw $semi:\n$plan")
    // gate: above the observed-candidate-count budget every hint vanishes —
    // the strategy belongs to AQE/shuffle, never a blind plan-time broadcast
    val gated = planNoAutoBroadcastOf(
      graft.operators.TextOps.neardupJaccardPairsImpl(spark, sf0001, candBudget = 0L))
    assert(!gated.contains("BroadcastExchange"),
      s"above budget no broadcast may remain mandatory:\n$gated")
  }

  test("neardup_minhash_lsh: banded bucket join shuffles O(reps × bands)") {
    val plan = planNoAutoBroadcast("neardup_minhash_lsh")
    assert(plan.contains("SortMergeJoin"), s"bucket join must shuffle on (band, bkey):\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"an unconditioned broadcast join would be the all-pairs regression:\n$plan")
  }

  test("phash_neardup: chunk-banded join shuffles; no all-pairs broadcast") {
    val plan = planNoAutoBroadcast("phash_neardup")
    assert(plan.contains("SortMergeJoin"), s"chunk join must shuffle on (ci, cv):\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"an unconditioned broadcast join would be the all-pairs regression:\n$plan")
  }

  test("bloom_prefilter_orders: might_contain guards the lineitem side, the " +
      "bloom builds once as a scalar subquery, and it actually prunes") {
    val df = Relational.bloomPrefilterOrders(spark, sf0001)
    val plan = executedPlan(df)
    assert(plan.contains("might_contain"),
      s"bloom predicate missing from the physical plan:\n$plan")
    assert(plan.contains("bloom_filter_agg") || plan.contains("Subquery"),
      s"bloom build (scalar subquery aggregate) missing:\n$plan")
    // pruning semantics at sf0.001 (views registered by the call above):
    // bloom admits every true match (no false negatives), rejects most
    // non-matches (false-positive mass ≤ 2% of the non-matching rows at
    // this key count vs the 1M/8M sizing), and the final result is the
    // plain join's — the oracle already pins that engine-vs-DuckDB.
    val sel = "SELECT o_orderkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')"
    val total = spark.table("lineitem").count()
    val pass = spark.sql(
      "SELECT count(*) FROM lineitem WHERE graft_might_contain(" +
        s"(SELECT graft_bloom_agg(o_orderkey) FROM ($sel)), l_orderkey)")
      .head().getLong(0)
    val exact = spark.sql(
      s"SELECT count(*) FROM lineitem WHERE l_orderkey IN ($sel)")
      .head().getLong(0)
    assert(exact > 0 && exact < total, "fixture must make the prefilter selective")
    assert(pass >= exact, s"bloom dropped true matches: pass=$pass exact=$exact")
    assert(pass - exact <= math.max(1L, (total - exact) / 50),
      s"bloom false-positive mass too high: pass=$pass exact=$exact total=$total")
  }

  test("Catalyst's own InjectRuntimeFilter plants the same bloom pair once " +
      "its size thresholds are met") {
    // the explicit bloom_prefilter_orders query exists because upstream's
    // 10 GiB application-side threshold never fires at test SFs; this pin
    // proves the engine-native path is the SAME machinery by lowering the
    // thresholds and asserting the optimizer injects bloom runtime filters
    // into a plain selective join on its own
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      import org.apache.spark.sql.functions.{col, count, lit}
      conf.set(keys(0), "true")
      conf.set(keys(1), "0")        // any application-side scan qualifies
      conf.set(keys(2), "100MB")    // any creation side qualifies
      conf.set(keys(3), "-1")       // force a shuffle join so injection applies
      val li = graft.Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val ord = graft.Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val plan = executedPlan(
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy().agg(count(lit(1)).as("n")))
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"runtime bloom filter not injected under permissive thresholds:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("span queries: the posting explode survives count()-pruning — the " +
      "bench-timed plan pays the real work") {
    // Bench times fn(...).count(); a LEFT join of a key-unique aggregate is
    // eliminated under count()'s column pruning, which once reduced
    // span_removal_stats' timed window to a lang-only scan (0.03 s) while
    // the ~3.6 s explode+semi-join hid in untimed warm-up. The full-outer
    // form keeps both branches; pin that the count-shaped plan still
    // generates postings (explode) for BOTH span queries.
    // the explode itself may sit inside the persisted postings cache
    // (InMemoryRelation hides its subtree from the plan string), so the pin
    // is the JOIN node: if the full-outer reverts to left, count()-pruning
    // eliminates the join — and with it the heavy branch — entirely
    Seq(
      "span_removal_stats" -> graft.operators.TextOps.spanRemovalStats(spark, sf0001),
      "repeated_span_stats" -> graft.operators.TextOps.repeatedSpanStats(spark, sf0001)
    ).foreach { case (name, df) =>
      val counted = df.groupBy().count() // what Dataset.count() plans
      val plan = counted.queryExecution.executedPlan.toString
      assert(plan.contains("FullOuter"),
        s"$name: count()-shaped plan lost the full-outer join — the heavy " +
          s"branch is prunable again and the timed bench window no longer " +
          s"measures the query's work:\n$plan")
      assert(plan.contains("LeftSemi"),
        s"$name: count()-shaped plan lost the dup-key semi join:\n$plan")
    }
  }

  test("stratified_sample_topk: bounded-heap partial aggregation, no Window sort") {
    // the scale claim: each partition reduces to ≤ k rows per stratum
    // BEFORE the shuffle (typed Aggregator partial mode) — the window
    // row_number form the oracle uses would shuffle-sort the whole corpus
    val plan = executedPlan(graft.operators.QualityOps.stratifiedSampleTopk(spark, sf0001))
    assert(!plan.contains("Window"),
      s"per-stratum top-k must not plan a window sort:\n$plan")
    assert(plan.contains("partial_topkbyscore") || plan.contains("ObjectHashAggregate"),
      s"bounded-heap aggregate missing (no partial top-k before the shuffle):\n$plan")
  }

  test("bucketed join: neither fact side shuffles — the bucket layout is consumed") {
    val plan = planNoAutoBroadcast("bucketed_join_orders")
    assert(plan.contains("SortMergeJoin"), s"bucketed fact join should sort-merge:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scans must consume bucket metadata:\n$plan")
    // co-location contract: no exchange hash-partitions either join key —
    // the bucketed layout already did; only the final tiny aggregate may
    // exchange (on o_orderpriority). (A within-partition Sort above each
    // scan remains: Spark dropped sorted-bucket-scan elision upstream in
    // SPARK-24528, and sorting already-sorted runs is the cheap part — the
    // shuffle is what matters at 100 TB.)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"join keys must not shuffle — bucket layout not consumed:\n$plan")
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

  test("dedup_clusters: the artifact-consuming small-graph path issues at most " +
      "2 eager actions (VERDICT r8 item 6; r13 item 1)") {
    // The r8 bench failure was a DRIVER-EXPOSURE regression: dedup_clusters
    // ran a chain of serialized driver-blocking actions, and each action
    // parked the driver at the mercy of host descheduling waves. The r13
    // shape consumes the prebuilt pair artifact (detection is priced once,
    // by neardup_jaccard_pairs' own row) and — under the edge budget —
    // labels with a driver-side union-find; the steady-state exposure is
    // TWO eager query executions during construction: the dispatch count
    // (which doubles as the pair-cache materialization) and the pair
    // collect. An extra barrier sneaking back in fails HERE, in CI,
    // without a bench run. The artifact is prebuilt below, mirroring the
    // bench protocol's prebuild pre-phase, so a stale zone's build jobs
    // don't pollute the count.
    graft.pipeline.DedupZone.ensurePairs(spark, sf0001)
    val (df, eagerDuringBuild) = countEagerActions(
      graft.operators.TextOps.dedupClusters(spark, sf0001))
    assert(eagerDuringBuild <= 2,
      s"dedup_clusters construction ran $eagerDuringBuild eager actions — " +
        "the steady-state exposure budget is 2 (dispatch count + driver " +
        "collect); a new driver-blocking barrier has snuck into the chain")
    // and the built result is still consumable with one terminal action
    assert(df.count() === 500L)
  }

  test("neardup_minhash_lsh: the banded relation materializes ONCE and both " +
      "sides of the candidate self-join read the cache (VERDICT r10 item 2)") {
    // r10's driver artifact burned 242.9 executor-CPU-s on this query with
    // run ≈ cpu — a REAL recompute signature: the banded self-join's x/y
    // branches each referenced the unpersisted signature+window subtree, and
    // nothing pinned cross-branch reuse. The fix materializes `banded`
    // eagerly; this pins (a) the construction exposure budget — exactly one
    // eager action, the banded count — and (b) that the terminal plan reads
    // the banded/groups CACHES (an in-memory scan node per reference)
    // instead of recompiling the signature pipeline per branch.
    val (df, eagerDuringBuild) = countEagerActions(
      graft.operators.TextOps.neardupMinhashLsh(spark, sf0001))
    assert(eagerDuringBuild <= 1,
      s"neardup_minhash_lsh construction ran $eagerDuringBuild eager " +
        "actions — the budget is 1 (the banded-relation materialization)")
    // capture the compiled plan BEFORE the terminal action: its
    // unpersistAfterAction hook drops the caches, after which a re-access
    // would recompile WITHOUT the in-memory relations
    val plan = df.queryExecution.executedPlan.toString
    val cacheScans = "InMemoryTableScan|TableCacheQueryStage".r
      .findAllIn(plan).size
    assert(cacheScans >= 2,
      s"the candidate self-join must read the materialized banded relation " +
        s"on BOTH branches (found $cacheScans cache-scan nodes):\n$plan")
    assert(df.count() > 0L)
  }

  /** Runs `body`, returning its result plus the number of eager query
    * executions it issued — counted via QueryExecutionListener (one
    * onSuccess per eager action; AQE stage jobs don't inflate it), with a
    * straggler drain on both edges since the listener bus is async.
    */
  private def countEagerActions[A](body: => A): (A, Int) = {
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val hook = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = actions.incrementAndGet()
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = actions.incrementAndGet()
    }
    def drain(): Int = {
      var last = -1
      var stable = 0
      var spins = 0
      while (stable < 5 && spins < 100) {
        val c = actions.get
        if (c == last) stable += 1 else { stable = 0; last = c }
        Thread.sleep(50L)
        spins += 1
      }
      actions.get
    }
    spark.listenerManager.register(hook)
    try {
      drain()
      actions.set(0)
      val result = body
      (result, drain())
    } finally spark.listenerManager.unregister(hook)
  }
}
