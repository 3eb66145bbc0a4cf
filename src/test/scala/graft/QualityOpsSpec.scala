package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityOps

/** Structural invariants for the corpus-quality operators on sf0.001; the
  * DuckDB differential oracle is the exactness gate.
  */
class QualityOpsSpec extends AnyFunSuite with SparkFixture {

  test("repetition stats: dup bigrams bounded by totals, ratio in [0,1]") {
    val rows = QualityOps.repetitionStats(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n2 = r.getAs[Long]("n_bigrams")
      val dup = r.getAs[Long]("n_dup_bigrams")
      assert(dup >= 0 && dup <= n2)
      val ratio = r.getAs[Double]("dup_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_repetitive") <= r.getAs[Long]("n_docs"))
    }
  }

  test("quality gate: pass + per-rule failures are consistent with n_docs") {
    val rows = QualityOps.qualityFilterCounts(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val pass = r.getAs[Long]("n_pass")
      val fails = Seq("n_fail_len", "n_fail_wordlen", "n_fail_stopword", "n_fail_repeat")
        .map(r.getAs[Long])
      assert(pass >= 0 && pass <= n)
      fails.foreach(f => assert(f >= 0 && f <= n))
      // a doc fails overall iff it fails ≥1 rule: failures cover the gap
      assert(fails.sum >= n - pass)
    }
  }

  test("hash split: partition of the corpus, stable across invocations") {
    val rows = QualityOps.hashSplitCounts(spark, sf0001).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = Tables.documents(spark, sf0001).count()
    assert(total === corpus, "every doc lands in exactly one (lang, split)")
    val again = QualityOps.hashSplitCounts(spark, sf0001).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq, "deterministic")
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // the 80/10/10 design should dominate: train is the largest split
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L))
  }

  test("oov: mass bounded by token totals, rare vocabulary actually detected") {
    val rows = QualityOps.oovStats(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_oov") >= 0)
      assert(r.getAs[Long]("total_oov") <= r.getAs[Long]("total_tokens"))
      val ratio = r.getAs[Double]("oov_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_high_oov") <= r.getAs[Long]("n_docs"))
    }
    assert(rows.map(_.getAs[Long]("total_oov")).sum > 0,
      "the relative vocabulary threshold must flag the corpus's rare words")
  }

  test("packing: bins dense from 0, doc ranges non-overlapping, totals preserved") {
    val rows = QualityOps.packingBinStats(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs === Tables.documents(spark, sf0001).count(), "every doc packed once")
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, bins) =>
      val ordered = bins.sortBy(_.getAs[Long]("bin"))
      assert(ordered.head.getAs[Long]("bin") === 0L, "packing starts at bin 0")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("bin") + 1 === b.getAs[Long]("bin"), "bins are dense")
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"),
            "doc-id ranges of consecutive bins must not overlap")
        case _ =>
      }
    }
  }

  test("decontamination: endpoints respect the hash split, scores in (0,1]") {
    import graft.operators.TextOps
    val rows = TextOps.decontaminationPairs(spark, sf0001).collect()
    assert(rows.nonEmpty, "sf0.001 contains cross-split contamination by construction")
    def bucket(id: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16) % 100
    }
    rows.foreach { r =>
      assert(bucket(r.getAs[Long]("test_doc")) >= 90, "left side must be a test doc")
      assert(bucket(r.getAs[Long]("train_doc")) < 80, "right side must be a train doc")
      val c = r.getAs[Double]("containment")
      assert(c >= 0.1 - 1e-9 && c <= 1.0)
    }
  }

  test("redaction: hits imply changed docs; untouched languages keep length") {
    val rows = QualityOps.redactionStats(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_hits")).sum > 0, "lexicon matches the corpus")
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      val changed = r.getAs[Long]("n_docs_changed")
      assert(changed <= hits, "each changed doc has >=1 hit")
      assert(changed <= r.getAs[Long]("n_docs"))
      if (hits == 0)
        assert(r.getAs[Long]("chars_after") === r.getAs[Long]("chars_before"))
    }
  }

  test("quality classifier: engine result equals an independent driver-side " +
    "naive Bayes kernel; verdicts are non-constant with real gate signal") {
    val docs = Tables.documents(spark, sf0001)
      .select("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    def toks(t: String): Seq[String] = t.split(" ").filter(_.nonEmpty).toSeq
    def c4Pass(ws: Seq[String]): Boolean = {
      val n = ws.size; val chars = ws.map(_.length.toLong).sum
      val stop = Set("the", "a", "of")
      val bg = if (n >= 2) ws.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
      n >= 10 && n <= 1000 && 2L * n <= chars && chars <= 12L * n &&
        ws.exists(stop) && 5L * (bg.size - bg.distinct.size) <= bg.size
    }
    def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val labeled = ds.map { case (_, id, t) =>
        val ws = toks(t); (id, ws, bucket(id), c4Pass(ws))
      }
      val train = labeled.filter(_._3 < 80)
      val (pos, neg) = train.partition(_._4)
      val cpos = pos.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cneg = neg.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val vocabSet = train.flatMap(_._2).toSet
      val (tpos, tneg, v) = (cpos.values.sum, cneg.values.sum, vocabSet.size.toLong)
      val prior = bitlen(pos.size + 1L) - bitlen(neg.size + 1L)
      def weight(term: String): Long =
        if (!vocabSet(term)) 0L
        else bitlen(cpos.getOrElse(term, 0L) + 1) + bitlen(tneg + v) -
          bitlen(cneg.getOrElse(term, 0L) + 1) - bitlen(tpos + v)
      val scoredDocs = labeled.map { case (_, ws, b, lab) =>
        (b, ws.size.toLong, lab, prior + ws.map(weight).sum > 0)
      }
      lang -> (labeled.length.toLong, pos.size.toLong, neg.size.toLong,
        scoredDocs.count(_._4).toLong, scoredDocs.filter(_._4).map(_._2).sum,
        scoredDocs.count(_._1 >= 90).toLong,
        scoredDocs.count(d => d._1 >= 90 && d._4 == d._3).toLong, v)
    }
    val rows = QualityOps.qualityClassifierStats(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === expected.keySet)
    rows.foreach { r =>
      val e = expected(r.getString(0))
      val got = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_train_pos"),
        r.getAs[Long]("n_train_neg"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("kept_tokens"), r.getAs[Long]("n_test"),
        r.getAs[Long]("n_test_agree"), r.getAs[Long]("vocab"))
      assert(got === e, s"lang ${r.getString(0)}")
    }
    // Contract checks on the verdicts. NOTE: agreement with the C4 gate is
    // NOT bounded against the majority-class rate on purpose — the gate's
    // dominant failure mode here is the LENGTH rule, which a bag-of-words
    // model cannot see by construction (faithful to practice: GPT-3's
    // tf-idf LR and fastText quality filters are bag-of-words too — the
    // heuristic gate and the learned filter are complementary, not
    // equivalent). The operator's contract is the exact scoring mechanics
    // (the kernel equality above + the DuckDB oracle), plus: the model must
    // not be a constant, and must carry better-than-chance gate signal.
    val kept = rows.map(_.getAs[Long]("n_kept")).sum
    val nAll = rows.map(_.getAs[Long]("n_docs")).sum
    assert(kept > 0 && kept < nAll,
      s"classifier is a constant verdict: kept $kept of $nAll")
    val agree = rows.map(_.getAs[Long]("n_test_agree")).sum.toDouble
    val test = rows.map(_.getAs[Long]("n_test")).sum.toDouble
    assert(test > 0)
    info(f"held-out agreement with the C4 gate: ${agree / test}%.3f")
    assert(agree / test > 0.5, "no better than a coin flip against the gate")
  }
}
