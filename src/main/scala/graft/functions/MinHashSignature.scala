package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native expression: the 64-lane MinHash signature of a shingle array, in
  * ONE pass over the array (VERDICT r9 item 1a).
  *
  * Replaces the widest aggregation state on the board: `neardupMinhashLsh`
  * previously exploded each representative's shingles and ran SIXTY-FOUR
  * independent `min(xxhash64(lit(i), shingle))` aggregate columns — correct
  * and map-side combined, but 64 aggregate buffers per group plus an
  * explode+shuffle whose only purpose was re-grouping rows the input
  * already had grouped (the shingle ARRAY is a column of the rep row).
  * Here the whole signature is a scalar projection on that array: no
  * explode, no aggregation, NO SHUFFLE — the signature stage becomes part
  * of the scan-side whole-stage-codegen pipeline, and the first exchange
  * in the query is the banding join itself.
  *
  * Hash contract: lane i equals Spark's `xxhash64(lit(i), shingle)` BIT
  * FOR BIT for bigint shingles (the pipeline pre-hashes shingle strings to
  * 64-bit keys) — seed chain `XXH64(long shingle, seed = XXH64(int i, 42))`
  * via the same `XxHash64Function` the built-in expression calls — so
  * candidate generation, banding, and measured recall are byte-identical
  * to the aggregate form this replaces (pinned in CustomFunctionSpec).
  *
  * An EMPTY shingle array yields all-Long.MaxValue lanes; callers that
  * relied on explode dropping empty sets must filter `size(sh) > 0`
  * (neardupMinhashLsh does) — otherwise all empty sets would band
  * together and reach the exact-verify join as candidates.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if numHashes > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<bigint> (pre-hashed shingles), " +
            s"got ${other.simpleString}")
    }

  // Per-lane seeds: XXH64 of the lane index at Spark's fixed seed 42 — the
  // exact prefix of the two-child xxhash64 chain, hoisted out of the loop
  // because it does not depend on the data.
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XxHash64Function.hash(i, IntegerType, 42L))

  def computeSignature(input: ArrayData): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = input.numElements()
    var e = 0
    while (e < n) {
      if (!input.isNullAt(e)) {
        val v = input.getLong(e)
        var i = 0
        while (i < numHashes) {
          val h = XxHash64Function.hash(v, LongType, seeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  override protected def nullSafeEval(input: Any): Any =
    computeSignature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSignature].getName)
    defineCodeGen(ctx, ev, v => s"$self.computeSignature($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}
