// In the org.apache.spark.sql package tree: custom Expressions need
// sql-private API surface (ExpressionUtils for Column construction)
// that has no public equivalent in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Hilbert xy→d kernel (the classic public-domain quadrant-rotation
  * loop). Called from generated code; kept in a plain object with a
  * static forwarder.
  */
object GraftHilbertUtil {
  /** Hilbert index of (x, y) on the 2^bits × 2^bits grid. Inputs must
    * be in [0, 2^bits); the result is in [0, 4^bits). The loop is the
    * standard per-bit quadrant walk: take the quadrant digit, then
    * reflect/swap the low coordinates into the sub-quadrant's frame.
    */
  def hilbertD(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    // fail-fast: an out-of-range coordinate (negative, or >= 2^bits)
    // would walk the quadrant loop into a garbage-but-in-range index
    // — rows silently sort to wrong curve positions and distinct
    // points collide, corrupting exactly the clustering this
    // expression exists to provide
    if (x0 < 0 || x0 >= n || y0 < 0 || y0 >= n)
      throw new IllegalArgumentException(
        s"hilbert_index: coordinate ($x0, $y0) outside [0, $n) " +
          s"for bits=$bits — clamp or rescale upstream")
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert space-filling index of two `bits`-bit coordinates — the
  * locality-better alternative to the Morton interleave
  * (graft.ext.Layout.zorder16): consecutive Hilbert indices are
  * always grid-adjacent (no Z-curve diagonal jumps), so rows sorted
  * by it keep BOTH columns' row-group min/max stats strictly tighter
  * for range predicates. The per-bit rotation state makes the closed
  * arithmetic form exponential as a Column expression tree, so this
  * is a native codegen expression instead: O(bits) loop per row
  * inside WholeStageCodegen. The DuckDB oracle mirrors the loop as
  * generated layered SQL (graft.ext.Layout.hilbertSql) — same
  * arithmetic, layer per bit.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftHilbertUtil.hilbertD(bits, a.asInstanceOf[Long],
      b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.GraftHilbertUtil.hilbertD($bits, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertColumns {
  def hilbert_index(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(HilbertIndex(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y), bits))

  /** SQL builder: `hilbert_index(x, y, bits)` with `bits` a foldable
    * integer literal (it parameterizes the generated code, so it
    * cannot be a runtime column).
    */
  def fromChildren(children: Seq[Expression]): HilbertIndex = {
    require(children.size == 3,
      "hilbert_index(x, y, bits) takes exactly 3 arguments")
    require(children(2).foldable,
      "bits must be a literal — it parameterizes the generated kernel")
    val bits = children(2).eval() match {
      case i: Int => i
      // bounds-check BEFORE narrowing: a bigint literal of 2^32+17
      // would silently wrap to 17 and build a wrong-grid curve —
      // the silent-corruption mode the coordinate fail-fast exists
      // to prevent
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case other => throw new IllegalArgumentException(
        s"bits must be an int-range integer literal, got $other")
    }
    HilbertIndex(children(0), children(1), bits)
  }
}
