package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native expression: the L sign-LSH bucket ids of a double vector — one
  * `bits`-wide random-hyperplane signature per hash table, returned as
  * `array<bigint>` of length L (index = table id, pairs with `posexplode`).
  * `bits` defaults to [[SignLshBuckets.Bits]] (4) and is PARAMETERIZED
  * (VERDICT r11 item 1): at a growing corpus the per-table bucket
  * occupancy is n/2^bits, so the ingest-time ANN path widens the
  * signature with log₂(corpus) to keep probe volume bounded — each extra
  * bit halves occupancy. Plane p of table t is derived from the hash of
  * (t, p, dim-index) alone, independent of the configured width, so a
  * width-b signature's low 4 bits agree with the default signature
  * (asserted in CustomFunctionSpec) and widening never reshuffles the
  * existing plane set — it appends planes.
  *
  * Design point this replaces: the HOF formulation re-evaluated
  * `xxhash64(table, plane, dim)` per vector ELEMENT per row — but the ±1
  * hyperplane matrix is a CONSTANT of (tables, bits, dim). Here it is
  * derived once per dimensionality (via the same Catalyst `XxHash64` chain,
  * so for NULL-FREE vectors bucket ids are bit-identical to the HOF form —
  * asserted in CustomFunctionSpec) and the projection is a fused primitive
  * loop. At cluster scale this is the difference between shipping a small
  * projection matrix with the task and doing 2 k hash calls per row.
  *
  * Null-element semantics intentionally DIVERGE from the HOF form
  * (ADVICE r3): a null element yields a null RESULT ROW (the vector is
  * excluded from bucketing), where the HOF's null projection silently
  * unset every bit and still bucketed the vector at id 0 — a join-able
  * garbage bucket. The bit-identity claim above is scoped to null-free
  * input, which is what the embeddings corpus carries.
  */
case class SignLshBuckets(child: Expression, bits: Int = SignLshBuckets.Bits)
    extends UnaryExpression with Serializable {

  require(bits >= 1 && bits <= SignLshBuckets.MaxBits,
    s"sign_lsh_buckets width must be in [1, ${SignLshBuckets.MaxBits}], got $bits")

  private val tables = SignLshBuckets.Tables

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_lsh_buckets expects array<double>, got ${other.simpleString}")
    }

  /** Fused projection: for each table t, bit p set iff
    * Σ_j v_j · plane(t,p,j) ≥ 0. Null elements poison the row → null.
    */
  def computeBuckets(v: ArrayData): ArrayData = {
    val dim = v.numElements()
    val planes = SignLshBuckets.planesFor(dim, bits)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < bits) {
        val row = planes(t * bits + p)
        var proj = 0.0
        var j = 0
        while (j < dim) {
          if (v.isNullAt(j)) return null
          proj += v.getDouble(j) * row(j)
          j += 1
        }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    computeBuckets(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signLsh", this, classOf[SignLshBuckets].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = $self.computeBuckets($v);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh_buckets"
}

object SignLshBuckets {
  /** 16 tables × 4 bits: for a neighbor at angle θ the per-bit collision
    * rate is p = 1 − θ/π, a table hits with p⁴, and overall recall is
    * 1 − (1 − p⁴)^L — on this corpus's best-neighbor cos ≈ 0.35 (p ≈ 0.61)
    * that is ≈ 0.56 at L = 8 and ≈ 0.91 at L = 16. Doubling L was ~free
    * once the planes became a precomputed constant (it cost 2× the per-row
    * hashing under the HOF form).
    */
  val Tables = 16
  val Bits = 4

  /** Hard upper bound on the configurable width — 20 bits × 16 tables
    * keeps the bucket id comfortably inside a Long and bounds the plane
    * cache; a corpus needing more than 2^20 buckets per table (occupancy
    * target 32 → ~33M vectors) should ALSO shard the arriving batch.
    */
  val MaxBits = 20

  /** ±1 plane matrix rows indexed by (table·bits + plane), derived from the
    * SAME hash chain as the HOF form it replaces:
    * `pmod(xxhash64(table, plane, dim), 2) == 0 → +1 else −1` with all three
    * inputs as int literals. Cached per (dimensionality, width); cheap
    * enough that a lost cache (executor restart) just recomputes. Plane
    * (t, p) depends only on (t, p, j) — never on the configured width — so
    * widening appends planes without disturbing existing ones.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  def planesFor(dim: Int, bits: Int): Array[Array[Double]] =
    cache.computeIfAbsent((dim, bits), { case (d, b) =>
      Array.tabulate(Tables * b, d) { (row, j) =>
        val t = row / b
        val p = row % b
        // seed 42 = the default of functions.xxhash64, which the HOF form used
        val h = XxHash64(Seq(Literal(t), Literal(p), Literal(j)), 42L)
          .eval(null).asInstanceOf[Long]
        if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
      }
    })
}
