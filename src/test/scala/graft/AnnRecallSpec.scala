package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** LSH ANN is approximate by design — no SQL oracle. This asserts its
  * quality envelope against the exact brute-force top-k instead.
  */
class AnnRecallSpec extends AnyFunSuite with SparkFixture {

  // The whole pipeline is DETERMINISTIC (hyperplanes and seeds are
  // id-derived, the corpus is fixed), so recall is an exact number per SF,
  // not a flake-prone sample — the 0.9 floors are VERDICT r8 item 5's bar
  // at both test scale factors.
  private val sfs = Seq("sf0.001" -> sf0001, "sf0.01" -> sf001)

  for ((sfName, sfDir) <- sfs) {
    test(s"LSH ANN at $sfName: multi-probe recall >= 0.9 vs exact top-k") {
      val exact = VectorOps.annCosineTopk(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val approx = VectorOps.annLshTopk(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

      assert(approx.nonEmpty, "LSH buckets must produce candidates")
      // no self-matches
      approx.foreach { case (q, n) => assert(q !== n) }

      val recall = if (exact.isEmpty) 1.0 else exact.intersect(approx).size.toDouble / exact.size
      info(f"LSH recall@5 vs exact: $recall%.3f (approx pairs: ${approx.size}, exact: ${exact.size})")
      // 16 tables × 4 bits alone measured 0.84 on this UNCLUSTERED random
      // corpus (best-neighbor cos ≈ 0.35 → per-table hit ≈ 0.14); the
      // Hamming-1 multi-probe ring lifts the per-table hit ~3.5× and the
      // measured recall above 0.9 at both SFs.
      assert(recall >= 0.9)
    }

    test(s"IVF ANN at $sfName: two-iteration quantizer recall >= 0.9 vs exact top-k") {
      val exact = VectorOps.annCosineTopk(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val rows = VectorOps.annIvfTopk(spark, sfDir).collect()
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
      // the two-iteration quantizer routes the label-clustered corpus's
      // true neighbors into probed lists while scanning only nprobe/K = 1/8
      // of it; measured ≥ 0.9 at both SFs.
      assert(recall >= 0.9)
    }

    test(s"IVFQ ANN at $sfName: exact-oracle seed quantizer recall >= 0.9 vs exact top-k " +
        "(r15 groundwork for the r16 admission)") {
      val exact = VectorOps.annCosineTopk(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val rows = VectorOps.annIvfqTopk(spark, sfDir).collect()
      val approx = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

      assert(approx.nonEmpty, "IVFQ lists must produce candidates")
      approx.foreach { case (q, n) => assert(q !== n) }
      rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, grp) =>
        val rks = grp.map(_.getAs[Int]("rank")).sorted.toSeq
        assert(rks === (1 to grp.length))
      }

      val recall = if (exact.isEmpty) 1.0 else exact.intersect(approx).size.toDouble / exact.size
      info(f"IVFQ recall@5 vs exact: $recall%.3f (approx pairs: ${approx.size}, exact: ${exact.size})")
      // the seed quantizer trades Lloyd refinement for integer-exact
      // DuckDB replayability (annIvfqTopkSql); closure assignment
      // (replication 2) + nprobe 2 holds the recall floor anyway
      assert(recall >= 0.9)
    }

    test(s"PQ ANN at $sfName: ADC-shortlist + exact-rerank recall >= 0.9 vs exact top-k") {
      val exact = VectorOps.annCosineTopk(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val rows = VectorOps.annPqTopk(spark, sfDir).collect()
      val approx = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

      assert(approx.nonEmpty, "PQ shortlist must produce candidates")
      approx.foreach { case (q, n) => assert(q !== n) }
      rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, grp) =>
        val rks = grp.map(_.getAs[Int]("rank")).sorted.toSeq
        assert(rks === (1 to grp.length))
      }

      val recall = if (exact.isEmpty) 1.0 else exact.intersect(approx).size.toDouble / exact.size
      info(f"PQ recall@5 vs exact: $recall%.3f (approx pairs: ${approx.size}, exact: ${exact.size})")
      // the 4-byte ADC codes only RANK the shortlist; the exact int8-cosine
      // rerank of the top-50 recovers the true neighbors — the FAISS
      // shortlist+rerank contract. The residual loss is true neighbors the
      // distorted codes push below rank 50.
      assert(recall >= 0.9)
    }

    test(s"IVFADC ANN at $sfName: probed-cells ADC recall >= 0.9 vs exact top-k " +
        "(VERDICT r11 item 2)") {
      val exact = VectorOps.annCosineTopk(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val rows = VectorOps.annIvfPqTopk(spark, sfDir).collect()
      val approx = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      assert(approx.nonEmpty, "IVFADC must produce candidates")
      approx.foreach { case (q, n) => assert(q !== n) }
      rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, grp) =>
        val rks = grp.map(_.getAs[Int]("rank")).sorted.toSeq
        assert(rks === (1 to grp.length))
      }
      val recall = if (exact.isEmpty) 1.0 else exact.intersect(approx).size.toDouble / exact.size
      info(f"IVFADC recall@5 vs exact: $recall%.3f")
      assert(recall >= 0.9)
    }

    test(s"IVFADC at $sfName SCANS PROBED LISTS ONLY: candidates == probed cells' " +
        "members, strictly fewer than the flat ADC scan") {
      import org.apache.spark.sql.functions.{col, countDistinct}
      val n = graft.Tables.embeddings(spark, sfDir).count()
      val cand = VectorOps.ivfPqCandidates(spark, sfDir)
      val candCount = cand.count()
      // flat ADC scan volume = every (query, corpus-vector) pair
      val queries = 10L
      assert(candCount < queries * (n - 1) / 2,
        s"IVFADC candidates ($candCount) must be well below the flat scan (${queries * (n - 1)})")
      // containment: every candidate is a member of one of the query's
      // probed cells — probes recomputed INDEPENDENTLY driver-side from the
      // zone artifacts (16 centroids + 10 query vectors collect fine)
      val cents = graft.pipeline.AnnZone.ensureIvfCentroids(spark, sfDir).collect()
        .map(r => r.getAs[Long]("cid") ->
          r.getAs[scala.collection.Seq[Double]]("cv").toArray).toMap
      val qvecs = graft.Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < 10).collect()
        .map(r => r.getLong(0) ->
          r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
        dot / math.sqrt(na * nb)
      }
      val probedCells: Map[Long, Set[Long]] = qvecs.map { case (q, v) =>
        q -> cents.toSeq.map { case (cid, cv) => (cid, cos(v, cv)) }
          .sortBy { case (cid, s) => (-s, cid) }.take(2).map(_._1).toSet
      }
      val members: Map[Long, Set[Long]] =
        graft.pipeline.AnnZone.ensureIvfLists(spark, sfDir)
          .select(col("cid"), col("neighbor_id")).collect()
          .groupBy(_.getLong(0)).map { case (cid, rs) => cid -> rs.map(_.getLong(1)).toSet }
      cand.collect().foreach { r =>
        val (q, nb) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        assert(probedCells(q).exists(cid => members(cid).contains(nb)),
          s"candidate ($q, $nb) is not a member of any of $q's probed cells ${probedCells(q)}")
      }
      info(s"IVFADC at $sfName: $candCount candidates vs flat scan ${queries * (n - 1)}, corpus $n")
    }
  }

  test("Lloyd-refined PQ codebook vs seed book: recall@5 at constant shortlist " +
      "(VERDICT r11 item 8 — result recorded either way)") {
    val sfDir = sf001
    val exact = VectorOps.annCosineTopk(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      val s = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      exact.intersect(s).size.toDouble / exact.size
    }
    val seed = recallOf(VectorOps.annPqTopk(spark, sfDir).collect())
    val refined = recallOf(VectorOps.annPqTopkWith(spark, sfDir,
      graft.pipeline.AnnZone.ensurePqCodesRefined(spark, sfDir),
      graft.pipeline.AnnZone.ensurePqCodebookRefined(spark, sfDir)).collect())
    info(f"PQ recall@5 at shortlist ${VectorOps.PqShortlist}: seed $seed%.3f, " +
      f"Lloyd-refined $refined%.3f")
    // NEGATIVE RESULT, recorded as measured (BASELINE.md r12): the
    // integer-quantized Lloyd refinement LOWERS recall on this corpus
    // (0.960 → 0.880 at sf0.01) — K=16 entries over ~31 members each means
    // the rounded means drift off the data manifold, where the seed
    // entries ARE data points. The production queries therefore keep the
    // SEED book. If this assert ever flips (new corpus/geometry), the
    // refined book earned adoption — re-evaluate, don't just relax it.
    assert(seed >= 0.9, "the adopted (seed) book must clear the envelope bar")
    assert(refined <= seed,
      "refinement measured worse when recorded; it now measures better — " +
        "re-run the item-8 adoption decision (see annIvfPqTopk's scaladoc)")
  }

  /** Exact batch→corpus oracle shared by the incremental-ANN tests: the
    * arriving-batch membership recomputed from first principles (MD5
    * salted bucket, independent of the engine's Splits code) and the
    * brute-force cosine top-5 with the query's tie-break.
    */
  private def incrementalExact(sfDir: String): (Set[Long], Set[(Long, Long)]) = {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val ids = emb.select("vec_id").collect().map(_.getLong(0))
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"annb:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val batchIds = ids.filter(bucket(_) >= 90).toSet
    assert(batchIds.nonEmpty && batchIds.size < ids.length,
      "the salted split must produce a non-trivial arriving batch")
    val vecs = emb.collect().map(r => r.getLong(0) ->
      r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val corpusIds = ids.filterNot(batchIds)
    val exact = batchIds.toSeq.flatMap { q =>
      corpusIds.map(c => (q, c, cos(vecs(q), vecs(c))))
        .sortBy { case (_, c, s) => (-s, c) }.take(5).map { case (_, c, _) => (q, c) }
    }.toSet
    (batchIds, exact)
  }

  for ((sfName, sfDir) <- sfs) {
    test(s"incremental ANN at $sfName: batch-vs-corpus recall >= 0.9 vs exact scan") {
      val (batchIds, exact) = incrementalExact(sfDir)
      val approx = VectorOps.incrementalAnnTopk(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      approx.foreach { case (q, n) =>
        assert(batchIds(q), "query ids must be arriving-batch members")
        assert(!batchIds(n), "neighbors must be corpus members — the index may not contain the batch")
      }
      val recall = exact.intersect(approx).size.toDouble / exact.size
      info(f"incremental ANN recall@5 vs exact batch->corpus scan: $recall%.3f " +
        f"(batch ${batchIds.size}, corpus ${exact.size / 5} queries' corpus)")
      assert(recall >= 0.9)
    }
  }

  test("incremental ANN at the WIDE adaptive signature: recall >= 0.9 (VERDICT r11 item 1)") {
    // The 10x-rehearsal store derives 10 bits/table from adaptiveSignatureBits
    // (18k corpus vectors / occupancy target 32); this re-measures recall at
    // that exact width + the Hamming-2 ring on the test corpus, where
    // occupancy is ~2/table — the hard case for a wide signature, since
    // recall rides almost entirely on the probe ring.
    assert(VectorOps.adaptiveSignatureBits(18000L) === 10)
    assert(VectorOps.probeRadiusFor(10) === 2)
    // the floor holds at the test SFs: artifacts there stay at the r11 width
    assert(VectorOps.adaptiveSignatureBits(450L) === 4)
    val (batchIds, exact) = incrementalExact(sf001)
    val approx = VectorOps.incrementalAnnTopkAt(spark, sf001, bits = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    approx.foreach { case (q, n) => assert(batchIds(q) && !batchIds(n)) }
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"incremental ANN recall@5 at 10 bits + Hamming-2 ring: $recall%.3f")
    assert(recall >= 0.9)
  }

  test("SHARDED incremental ANN equals the unsharded run row-for-row under a " +
      "budget that forces multiple ticks (r12 — the gate's named mitigation, in code)") {
    import org.apache.spark.sql.functions.col
    val sfDir = sf001
    val reference = VectorOps.incrementalAnnTopk(spark, sfDir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    // size a per-tick budget at ~1/3 of the real probe volume → ≥ 3 shards
    val bits = VectorOps.corpusSignatureBits(spark, sfDir)
    val index = graft.pipeline.AnnZone.ensureCorpusLshBuckets(spark, sfDir)
      .select(col("neighbor_id"), col("t").as("ct"), col("b").as("cb"))
    val batch = VectorOps.embFrame(spark, sfDir).filter(VectorOps.isArrivingVec)
    val total = VectorOps.probeRowVolume(spark, batch, index, bits)
    assert(total > 3, "fixture must have non-trivial probe volume")
    val budget = total / 3
    val sharded = VectorOps.incrementalAnnTopkSharded(spark, sfDir, budget)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    info(s"probe volume $total rows, per-tick budget $budget → " +
      s"${(total + budget - 1) / budget} shards")
    assert(sharded === reference,
      "per-query independence must make the sharded union equal the unsharded run")
  }

  test("incremental ANN AUTO-SHARDS past its probe-volume budget: the " +
      "gate-trip dispatch path equals the unsharded run row-for-row " +
      "(VERDICT r14 item 3 — dispatch is automatic, not a manual kernel)") {
    import org.apache.spark.sql.functions.col
    val sfDir = sf001
    val reference = VectorOps.incrementalAnnTopk(spark, sfDir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    // a budget at ~1/3 of the real volume trips the dispatch into the
    // sharded arm THROUGH the declared entry point's own impl
    val bits = VectorOps.corpusSignatureBits(spark, sfDir)
    val index = graft.pipeline.AnnZone.ensureCorpusLshBuckets(spark, sfDir)
      .select(col("neighbor_id"), col("t").as("ct"), col("b").as("cb"))
    val batch = VectorOps.embFrame(spark, sfDir).filter(VectorOps.isArrivingVec)
    val total = VectorOps.probeRowVolume(spark, batch, index, bits)
    assert(total > 3, "fixture must have non-trivial probe volume")
    val tripped = VectorOps.incrementalAnnTopkImpl(spark, sfDir,
        probeBudget = total / 3)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    info(s"probe volume $total rows, dispatch budget ${total / 3} → auto-shard")
    assert(tripped === reference,
      "the auto-shard dispatch must reproduce the unsharded answer exactly")
  }

  test("incremental ANN FAILS LOUDLY past the shard cap (a tick too large " +
      "to shard is a deployment sizing error, not a knob)") {
    // a 1-row budget needs more shards than MaxIngestShards at sf0.001 —
    // the auto-dispatch must throw the sizing diagnosis, never attempt
    // hundreds of probe joins
    val e = intercept[IllegalStateException] {
      VectorOps.incrementalAnnTopkImpl(spark, sf0001, probeBudget = 1L)
    }
    assert(e.getMessage.contains("shards"))
    assert(e.getMessage.contains("sizing error"))
    // and the real default still runs at the test SFs
    assert(VectorOps.incrementalAnnTopk(spark, sf0001).limit(1).count() >= 0)
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
