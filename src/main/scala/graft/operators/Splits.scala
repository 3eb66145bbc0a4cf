package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE definition of the deterministic train/val/test document split
  * (ADVICE r10: `decontaminationPairs` and `contaminationRemovalStats` each
  * re-derived the bucket expression and the `< 80` train threshold
  * independently — if either had drifted, unmatched dirty ids would have
  * formed a null-lang group and silently inflated the removal ledger; now a
  * drift is impossible by construction because every split consumer reads
  * the same Column factory and the same thresholds).
  *
  * Bucket = first 32 md5 bits of the stable doc id, mod 100 → train < 80 ≤
  * val < 90 ≤ test. Content-free and id-stable, so (a) the split is
  * reproducible from the id alone with no stored assignment table, and
  * (b) growing the corpus never moves an existing doc between splits — the
  * property that keeps a held-out set clean across pipeline re-runs. The
  * md5-prefix bit source is engine-independent, so every DuckDB oracle
  * reproduces it exactly (`('0x' || substring(md5(doc_id::VARCHAR), 1, 8))
  * ::BIGINT % 100`).
  *
  * Consumers: [[TextOps.decontaminationPairs]] /
  * [[TextOps.contaminationRemovalStats]] (train⋈test contamination),
  * [[TextOps.bm25TopK]] (test queries vs train candidates),
  * [[QualityOps.hashSplitCounts]] / [[QualityOps.packingShardedStats]].
  */
private[graft] object Splits {
  /** bucket < TrainMax ⇒ train. */
  val TrainMax = 80
  /** TrainMax ≤ bucket < ValMax ⇒ val; ≥ ValMax ⇒ test. */
  val ValMax = 90

  /** THE salted id-stable bucket recipe in [0, 100): md5 of (salt ++ id),
    * first 8 hex chars, mod 100. Every bucket split in the engine — the
    * unsalted train/val/test [[bucket]], the mixture sampler ("mix:"), the
    * ANN ingest split ("annb:") — derives from this one definition so the
    * recipes cannot drift apart (r11 review: three hand-rolled copies).
    * An empty salt reproduces the original unsalted md5(id) exactly.
    */
  def saltedBucket(salt: String, id: Column): Column = {
    val key =
      if (salt.isEmpty) id.cast("string")
      else concat(lit(salt), id.cast("string"))
    pmod(conv(substring(md5(key), 1, 8), 16, 10).cast("long"), lit(100L))
  }

  /** The id-stable split bucket in [0, 100). */
  def bucket: Column = saltedBucket("", col("doc_id"))

  def isTrain: Column = bucket < TrainMax
  def isTest: Column = bucket >= ValMax

  /** 'train' | 'val' | 'test' label over [[bucket]]. */
  def splitName: Column =
    when(bucket < TrainMax, "train").when(bucket < ValMax, "val").otherwise("test")
}
