package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: |A ∩ B| for two ASCENDING-SORTED long arrays
  * with no null elements, via a two-pointer merge — zero allocation.
  *
  * Why it exists: `size(array_intersect(a, b))` materializes the
  * intersection array per evaluation. In the all-pairs Jaccard verify path
  * that is ~2.5 M allocations per run at sf0.1, which made the query's wall
  * time a function of accumulated JVM heap state (measured 3.9 s ↔ 54 s for
  * identical plans). A counting merge keeps the hot loop allocation-free
  * and inside whole-stage codegen.
  *
  * Precondition (caller's contract, not checked): both arrays sorted
  * ascending, elements non-null — shingle fingerprint sets pass through
  * `sort_array(array_distinct(...))` upstream. Null ARRAYS yield null
  * (BinaryExpression default).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"intersect_size expects (array<bigint>, array<bigint>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { n += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0;
         |${ev.value} = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $x.getLong($i);
         |  long $yj = $y.getLong($j);
         |  if ($xi == $yj) { ${ev.value}++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "intersect_size"
}
