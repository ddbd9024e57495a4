// In the org.apache.spark.sql package tree: custom Expressions need
// sql-private API surface (ExpressionUtils for Column construction)
// that has no public equivalent in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Kernel behind [[OrderedPairs]] — called from generated code. */
object GraftPairUtil {
  /** All (i < j) element pairs of one SORTED postings list as
    * two-field rows, in ONE output allocation. The declarative
    * `transform(ids, (x,i) => transform(slice(ids, i+2, n), ...))`
    * composition this replaces is interpreted (higher-order functions
    * are CodegenFallback) and allocates a SLICE COPY of the tail per
    * element plus a flatten copy of everything — O(n²) transient
    * arrays per list on the hottest path of every inverted-index pair
    * generator.
    */
  def pairs(ids: ArrayData, et: DataType): ArrayData = {
    val n = ids.numElements()
    // n(n-1)/2 overflows Int at n = 46342 (to a negative or, worse, a
    // small positive size) — every in-repo caller df-caps its lists
    // far below this, so an uncapped list reaching here is a caller
    // bug that must fail with the bound spelled out, not an
    // ArrayIndexOutOfBounds three frames deep
    require(n.toLong * (n - 1) / 2 <= Int.MaxValue,
      s"ordered_pairs: $n elements expand to ${n.toLong * (n - 1) / 2} " +
        "pairs (> Int.MaxValue) — cap the postings list before pairing")
    // size computed in LONG then narrowed: the Int product n*(n-1)
    // overflows for n >= 46342 even when the pair count the require
    // above just admitted fits an Int
    val out = new Array[Any]((n.toLong * (n - 1) / 2).toInt)
    var idx = 0
    var i = 0
    while (i < n - 1) {
      val a = ids.get(i, et)
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(Array[Any](a, ids.get(j, et)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<struct<aName, bName>>` of all (i < j) element pairs of the
  * child array — the in-row pair expansion of the df-capped inverted
  * indexes (substring/Jaccard dedup, co-occurrence edges, common-
  * neighbor wedges), as one codegen'd kernel call. Sortedness of the
  * input (the callers' `sort_array`) makes i < j imply a < b; this
  * expression only preserves input order. Generic over the element
  * type exactly like the lambda form it replaces.
  */
case class OrderedPairs(child: Expression, aName: String, bName: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ordered_pairs needs an array input, got ${other.sql}")
    }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = {
    val at = child.dataType.asInstanceOf[ArrayType]
    ArrayType(StructType(Seq(
      StructField(aName, at.elementType, at.containsNull),
      StructField(bName, at.elementType, at.containsNull))),
      containsNull = false)
  }

  override def prettyName: String = "ordered_pairs"

  override def nullSafeEval(arr: Any): Any =
    GraftPairUtil.pairs(arr.asInstanceOf[ArrayData], elemType)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftPairUtil.pairs($c, $et)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): OrderedPairs = copy(child = newChild)
}

object PairColumns {
  def ordered_pairs(ids: Column, aName: String, bName: String): Column =
    ExpressionUtils.column(
      OrderedPairs(ExpressionUtils.expression(ids), aName, bName))
}
