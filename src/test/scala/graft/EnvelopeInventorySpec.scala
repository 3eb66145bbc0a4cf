package graft

import org.scalatest.funsuite.AnyFunSuite

/** One-place enumeration of every no-oracle-by-design query and its
  * ScalaTest correctness envelope (VERDICT r9 item 7): the driver records a
  * rows>0 check for queries absent from `SparkEntry.oracleSql`, so each such
  * row MUST carry a green spec that bounds the thing DuckDB can't express.
  * The assert makes the enumeration load-bearing — declaring a new query
  * without an oracle fails here until its envelope home is named.
  */
class EnvelopeInventorySpec extends AnyFunSuite {

  /** query → the spec + assertion that is its correctness home. */
  private val envelopes: Map[String, String] = Map(
    "agg_approx_distinct" ->
      "ScalarOpsSpec: HLL estimate within ±5% of exact countDistinct PER GROUP",
    "approx_percentiles_orders" ->
      "ScalarOpsSpec: sketch p50/p90 within ±2.5% of exact per group",
    "ann_lsh_topk" ->
      "AnnRecallSpec: multi-probe recall@5 >= 0.9 vs exact top-k at sf0.001 AND sf0.01",
    "ann_ivf_topk" ->
      "AnnRecallSpec: two-iteration IVF recall@5 >= 0.9 vs exact top-k at both SFs",
    "ann_ivfpq_topk" ->
      ("AnnRecallSpec: IVFADC recall@5 >= 0.9 vs exact top-k at both SFs PLUS " +
        "scan-containment (candidates == probed cells' members, strictly fewer " +
        "than the flat ADC scan)"),
    "incremental_ann_topk" ->
      ("AnnRecallSpec: arriving-batch recall@5 >= 0.9 vs an exact driver-side " +
        "batch->corpus scan at both SFs, plus batch/corpus membership asserts"),
    "media_feature_stats" ->
      "MultimodalSpec: BMP/PPM decode equals the pixel generator exactly",
    "audio_feature_stats" ->
      ("MultimodalSpec: WAV decode equals the sample generator exactly AND " +
        "the full query's per-rate aggregates equal a driver-side generator " +
        "kernel (differential, r11)"),
    "video_frame_stats" ->
      "MultimodalSpec: stride-vs-full-decode differential across real corpus parameters",
    "phash_neardup" ->
      "MultimodalSpec: banded pairs equal a brute-force Hamming scan (real + adversarial)")

  test("the no-oracle query set is exactly the enumerated envelope inventory") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === envelopes.keySet,
      s"no-oracle queries without an enumerated envelope: ${(noOracle -- envelopes.keySet).toSeq.sorted.mkString(", ")}; " +
        s"enumerated but oracle-checked or gone: ${(envelopes.keySet -- noOracle).toSeq.sorted.mkString(", ")}")
  }

  test("every oracle entry names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL for undeclared queries: $orphans")
  }
}
