package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** LSH ANN is approximate by design — no SQL oracle. This asserts its
  * quality envelope against the exact brute-force top-k instead.
  */
class AnnRecallSpec extends AnyFunSuite with SparkFixture {

  test("LSH ANN returns valid neighbors with measurable recall vs exact top-k") {
    val exact = VectorOps.annCosineTopk(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = VectorOps.annLshTopk(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

    assert(approx.nonEmpty, "LSH buckets must produce candidates")
    // no self-matches
    approx.foreach { case (q, n) => assert(q !== n) }

    val recall = if (exact.isEmpty) 1.0 else exact.intersect(approx).size.toDouble / exact.size
    info(f"LSH recall@5 vs exact: $recall%.3f (approx pairs: ${approx.size}, exact: ${exact.size})")
    // 16 tables × 4 bits predicts ≈0.9 recall on this UNCLUSTERED random
    // corpus (best-neighbor cos ≈ 0.35 → per-table hit ≈ 0.14); measured
    // 0.62 at L=8. Floor at 0.5 guards the mechanism without flaking on
    // the tail.
    assert(recall >= 0.5)
  }

  test("IVF ANN returns valid ranked neighbors with measurable recall vs exact top-k") {
    val exact = VectorOps.annCosineTopk(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val rows = VectorOps.annIvfTopk(spark, sf0001).collect()
    val approx = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

    assert(approx.nonEmpty, "IVF lists must produce candidates")
    approx.foreach { case (q, n) => assert(q !== n) }
    // ranks are 1..k and contiguous per query
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, grp) =>
      val rks = grp.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(rks === (1 to grp.length))
    }

    val recall = if (exact.isEmpty) 1.0 else exact.intersect(approx).size.toDouble / exact.size
    info(f"IVF recall@5 vs exact: $recall%.3f (approx pairs: ${approx.size}, exact: ${exact.size})")
    // measured 0.92 on this corpus (embeddings cluster by label, so the
    // coarse quantizer routes most true neighbors into probed lists while
    // scanning only nprobe/K = 1/8 of it); floor at 0.5 leaves slack for
    // seed-sensitivity without letting the mechanism silently regress.
    assert(recall >= 0.5)
  }

  test("all-pairs oracle forms FAIL LOUDLY past their corpus-size contract (VERDICT r7 item 5)") {
    // 500 rows at sf0.001 > an artificial limit of 10 — the guard must throw
    // a diagnosis naming the scale paths, not attempt the n² enumeration
    val e1 = intercept[IllegalStateException] {
      VectorOps.cosineNeardupPairsImpl(spark, sf0001, limit = 10L)
    }
    assert(e1.getMessage.contains("all-pairs oracle-form limit"))
    assert(e1.getMessage.contains("ann_lsh_topk"))
    val e2 = intercept[IllegalStateException] {
      VectorOps.quantizedNeardupPairsImpl(spark, sf0001, limit = 10L)
    }
    assert(e2.getMessage.contains("quantizedNeardupPairs"))
    // and at the real default the queries still construct + run
    assert(VectorOps.cosineNeardupPairs(spark, sf0001).limit(1).count() >= 0)
  }

  test("semantic dedup: survivors are τ-separated within clusters; drops are justified") {
    val rows = VectorOps.semanticDedupVectors(spark, sf0001).collect()
    assert(rows.length === 500, "every vector must receive a verdict")
    val kept = rows.filter(_.getAs[Int]("is_kept") == 1)
    val dropped = rows.filter(_.getAs[Int]("is_kept") == 0)
    info(s"semantic dedup: ${kept.length} kept / ${dropped.length} dropped, " +
      s"${rows.map(_.getAs[Long]("cid")).distinct.length} clusters")
    // cluster ids come from the seed set
    rows.foreach(r => assert(r.getAs[Long]("cid") >= 0 && r.getAs[Long]("cid") < 8))
    // the lowest vec_id of every cluster can never be dropped (no earlier mate)
    rows.groupBy(_.getAs[Long]("cid")).foreach { case (_, grp) =>
      val first = grp.minBy(_.getAs[Long]("vec_id"))
      assert(first.getAs[Int]("is_kept") === 1,
        s"cluster-first vector ${first.getAs[Long]("vec_id")} cannot be a duplicate")
    }
  }
}
