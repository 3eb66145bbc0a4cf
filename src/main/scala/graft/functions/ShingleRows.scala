package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR (the table-function leg of the
  * UDF/UDAF/UDTF trio — SURVEY §2.2 custom row): one input row of words →
  * n−k+1 output rows of (pos, shingle), streamed one shingle at a time.
  *
  * Why a Generator and not the declarative form the queries use
  * (`posexplode(transform(sequence(...), slice-concat))`)? The declarative
  * form MATERIALIZES the whole shingle array per document before the
  * explode — per-row transient memory O(document tokens × k). This
  * generator emits shingles lazily from the (already decoded) word array:
  * peak extra memory is one shingle string regardless of document length —
  * the difference between "fine" and "executor OOM" for the
  * million-token documents a 100 TB crawl corpus contains. Semantics are
  * proven IDENTICAL to the declarative form on the test corpus in
  * `CustomFunctionSpec`; the declared queries keep the declarative form
  * (whole-stage-codegen-friendly at test document sizes) and the generator
  * is the documented long-document escape hatch.
  *
  * Interpreted eval via [[CodegenFallback]]: Spark reserves generator
  * codegen for its own `CollectionGenerator`s (explode family), which
  * require a materialized collection — exactly what this operator exists
  * to avoid; `GenerateExec` streams the iterator either way.
  *
  * Null/short inputs: a null array generates nothing; fewer than k words
  * generate the single whole-text shingle, matching `TextOps.shingles`'
  * short-document rule.
  */
case class ShingleRows(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_rows expects array<string>, got ${other.catalogString}")
  }

  private def shingleAt(arr: ArrayData, start: Int, width: Int): UTF8String = {
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < width) {
      if (j > 0) sb.append(' ')
      val w = arr.getUTF8String(start + j)
      if (w != null) sb.append(w.toString)
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Iterator.empty
    else {
      val n = arr.numElements()
      if (n < k) Iterator.single(InternalRow(0, shingleAt(arr, 0, n)))
      else Iterator.tabulate(n - k + 1)(i => InternalRow(i, shingleAt(arr, i, k)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleRows =
    copy(child = newChild)

  override def prettyName: String = "shingle_rows"
}
