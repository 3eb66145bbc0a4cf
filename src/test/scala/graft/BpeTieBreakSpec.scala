package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Pins the BPE merge-table tie-break contract (ADVICE r9 high).
  *
  * The learned merge table orders pairs by (count DESC, md5(pair) ASC)
  * where `pair` is the two symbols joined by chr(1) — the SAME byte string
  * the DuckDB oracle CTE builds with `|| chr(1) ||`. The separator byte is
  * decisive whenever counts tie: md5("x" + sep + "y") sorts differently
  * for sep="" vs sep="\u0001", so a separator mismatch silently changes
  * the learned rank order (and, when the tie straddles the top-48 cut, the
  * merge SET). The engine source carries a literal 0x01 byte, which
  * renders invisibly — these tests make the contract observable.
  *
  * Both tests compare the engine against an independent plain-Scala
  * reference that re-derives the contract from scratch with
  * java.security.MessageDigest — no Spark expressions shared.
  */
class BpeTieBreakSpec extends AnyFunSuite with SparkFixture {

  private val Sep = "\u0001"
  private val Merges = 48
  private val MaxSteps = 24

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent reference: learn top-N merge ranks, apply to fixpoint
    * (lowest rank first; leftmost among its occurrences), return n_sub per
    * distinct word. Mirrors the documented contract, not the Spark code.
    */
  private def referenceCounts(words: Seq[String]): Map[String, Int] = {
    val vocab = words.groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    val pc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- vocab; i <- 0 until w.length - 1)
      pc(w.substring(i, i + 1) + Sep + w.substring(i + 1, i + 2)) += c
    val rank = pc.toSeq
      .sortBy { case (p, c) => (-c, md5hex(p)) }
      .take(Merges).zipWithIndex
      .map { case ((p, _), i) => (p, i + 1) }.toMap
    vocab.keys.map { w =>
      var syms = w.map(_.toString).toVector
      var step = 0
      var stuck = false
      while (step < MaxSteps && !stuck && syms.length > 1) {
        val cands = (0 until syms.length - 1)
          .flatMap(i => rank.get(syms(i) + Sep + syms(i + 1)).map(r => (r, i)))
        if (cands.isEmpty) stuck = true
        else {
          val i = cands.min._2
          syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
        }
        step += 1
      }
      (w, syms.length)
    }.toMap
  }

  private def engineCounts(words: Seq[String]): Map[String, Int] = {
    import spark.implicits._
    TextOps.learnedMergeTokenCounts(words.toDF("word"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
  }

  test("tie-heavy fixture: rank order among tied pairs follows md5(chr(1)-joined) bytes") {
    // Five copies of "wxyz": pairs wx, xy, yz all tie at count 5.
    // chr(1) contract ranks them (xy, wx, yz) -> xy merges first, stranding
    // w and z: 3 tokens. An empty-separator tie-break would rank (yz, xy,
    // wx) -> yz then wx merge: 2 tokens. The assert is therefore SENSITIVE
    // to the separator actually hashed, not just to "some deterministic
    // order".
    val words = Seq.fill(5)("wxyz")
    val expected = referenceCounts(words)
    assert(expected("wxyz") === 3, "reference self-check: chr(1) order strands w and z")
    assert(engineCounts(words) === expected)
  }

  test("tie at the top-N cut: engine and reference select the same merge SET") {
    // 49 distinct pairs all at count 1 via 49 two-char words sharing no
    // pairs: the 48-entry table must DROP exactly the md5-largest pair.
    // Each word is its own pair, so n_sub = 1 iff the word's pair made the
    // cut — the selected set is directly observable.
    val alpha = "abcdefghijklmnopqrstuvwxyz".toSeq
    val words = (for (a <- alpha; b <- alpha) yield s"$a$b").take(49)
    val expected = referenceCounts(words)
    assert(expected.values.count(_ == 2) === 1, "reference self-check: exactly one pair dropped")
    assert(engineCounts(words) === expected)
  }

  test("sf0.001 corpus differential: engine matches the independent reference end-to-end") {
    val docs = Tables.documents(spark, sf0001)
    val words = docs.select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty)).toSeq
    val engine = engineCounts(words.distinct) // engine takes the exploded corpus
    val engineFull = {
      import spark.implicits._
      TextOps.learnedMergeTokenCounts(words.toDF("word"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    }
    val expected = referenceCounts(words)
    assert(engineFull === expected)
    // counts learned from the full corpus differ from distinct-vocab counts
    // only via pair weights; both must agree with their own reference
    assert(engine === referenceCounts(words.distinct))
  }
}
