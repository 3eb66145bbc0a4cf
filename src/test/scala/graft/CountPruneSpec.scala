package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.scalatest.funsuite.AnyFunSuite

/** The count()-pruning inventory gate (r11, BASELINE.md "count()-pruning
  * audit"). The bench's timed action is `count()`; under it Catalyst prunes
  * the output columns and may then ELIMINATE subtrees whose cardinality no
  * longer matters — unique-key left joins, windows, lazy iteration chains.
  * That is correct optimizer behavior, but it means a query's timed board
  * row can silently stop pricing the operator's defining computation (it
  * deleted PageRank's iterations and the BPE learn/apply chain before the
  * r11 pins).
  *
  * This spec is the [[EnvelopeInventorySpec]] pattern applied to that
  * exposure: every query whose count() plan loses Join/Generate/Aggregate/
  * Window nodes must be ENUMERATED here with the reason the loss is
  * accepted (sub-second scalar/window tail, or a containment proof is
  * impossible so a pin would change rows). A NEW query that loses nodes —
  * or a regression that un-pins one of the five pinned plans — fails the
  * inventory equality below and must either be pinned count-robust (the
  * full-outer/inner row-identical forms, see BASELINE.md) or accepted
  * here explicitly with its measured noop-vs-count delta.
  */
class CountPruneSpec extends AnyFunSuite with SparkFixture {

  /** query → why the count()-plan node loss is accepted (r11 audit; noop
    * deltas measured at sf0.1, BASELINE.md). */
  private val accepted: Map[String, String] = Map(
    "asof_purchase_click" ->
      "as-of window only; noop delta ~0.1 s — the join itself is priced",
    "join_outer_customer_orders" ->
      "outer-join demo; count collapses to the outer side, delta ~0.1 s",
    "range_clicks_before_purchase" ->
      "range-join demo; delta ~0.4 s",
    "incremental_dedup_stats" ->
      "corpus-index probe join; corpus keys not a subset of batch keys, a pin would change rows; delta ~0.1 s",
    "incremental_neardup_stats" ->
      "band-index probe generates/joins; same no-containment argument; delta ~0.6 s",
    "incremental_ann_topk" ->
      "signature generates on the probe side; delta ~0.8 s",
    "rank_functions_orders" -> "rank window only; delta < 0.3 s",
    "resample_hourly_ffill" -> "ffill window + grid join; delta < 0.5 s",
    "scd2_user_value_history" -> "SCD2 windows only; delta < 0.2 s",
    "session_counts_per_user" -> "session window only; delta < 0.2 s",
    "window_running_user_value" -> "running window only; delta < 0.2 s",
    "training_manifest_stats" ->
      "packing prefix-sum window; the funnel joins/aggregates survive; delta ~0.1 s",
    // residuals on r11-pinned plans: the defining subtrees are pinned
    // (iterations, LM, scoring/training passes); what still prunes is a
    // dim-sized side computation
    "graph_rank_stats" ->
      "residual: the final degree left join (one scan+agg over the cached pair relation); iterations pinned",
    "quality_classifier_stats" ->
      "residual: the priors join (one train-scan aggregate to |langs| rows); training+scoring passes pinned")

  private def shape(p: LogicalPlan): Map[String, Int] = {
    var m = Map.empty[String, Int].withDefaultValue(0)
    p.foreach { n =>
      val k = n.getClass.getSimpleName
      if (k.contains("Join") || k.contains("Generate") ||
          k.contains("Aggregate") || k.contains("Window"))
        m = m.updated(k, m(k) + 1)
    }
    m
  }

  test("queries losing plan nodes under count() are exactly the accepted inventory") {
    val losers = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val full = shape(fn(spark, sf0001).queryExecution.optimizedPlan)
      val cnt = shape(fn(spark, sf0001).groupBy().count().queryExecution.optimizedPlan)
      val lost = full.toSeq.sorted.collect {
        case (k, v) if v > cnt.getOrElse(k, 0) => s"$k-${v - cnt.getOrElse(k, 0)}"
      }
      if (lost.nonEmpty) Some(name -> lost.mkString(", ")) else None
    }.toMap
    val unexplained = losers.keySet -- accepted.keySet
    val stale = accepted.keySet -- losers.keySet
    assert(unexplained.isEmpty,
      "queries losing count()-plan nodes without an accepted-inventory entry " +
        "(pin the plan count-robust or enumerate the acceptance): " +
        unexplained.toSeq.sorted.map(n => s"$n [${losers(n)}]").mkString("; "))
    // The inventory is an UPPER bound, not an exact set: a few plans flip
    // with artifact-zone state (a fresh AnnZone read is a parquet leaf; a
    // cold one carries the probe generates), so an entry may transiently
    // stop losing nodes. Only the strict direction — an UNEXPLAINED loser —
    // is a failure; report the slack for manual pruning.
    if (stale.nonEmpty)
      info(s"accepted entries not currently losing nodes: ${stale.toSeq.sorted.mkString(", ")}")
  }
}
