// In the org.apache.spark.sql package tree: custom Expressions need
// sql-private API surface (AbstractDataType for ExpectsInputTypes,
// ExpressionUtils for Column construction) that has no public
// equivalent in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Shared schema probe for the kernels below. */
private[graft] object VecKernelUtil {
  /** Whether the expression's ARRAY ELEMENTS may be null per the
    * schema — the kernels' per-element null-bit probes compile in
    * only then (containsNull=false proves them dead).
    */
  def mayNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull
}

import VecKernelUtil.mayNull

/** Native, codegen'd float-vector kernels. The higher-order-function
  * form (`aggregate(zip_with(...))`) evaluates a lambda per element —
  * per-element virtual calls and boxed closures on the hottest loop of
  * similarity search. These expressions compile to a tight primitive
  * loop inside WholeStageCodegen instead.
  *
  * Numerics are the exact IEEE754 sequence of the HOF form (and the
  * DuckDB oracles): left-to-right accumulation in double, each float
  * upcast exactly, so swapping the implementations never changes a
  * single bit of output.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemGetter(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case _ => "getDouble"
    }

  // null on length mismatch OR any NULL element — matching the
  // zip_with+aggregate fold this kernel replaces (zip_with pads with
  // null, the fold poisons to NULL; getFloat on a null slot would
  // silently read 0.0 and produce a confidently wrong score)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val rf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val nullable = mayNull(left) || mayNull(right)
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (nullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val ga = elemGetter(left)
      val gb = elemGetter(right)
      // the null-bit probe only compiles in when the SCHEMA says
      // elements can be null: a branch in this multiply-add loop
      // costs ~2x on the ANN hot path (it defeats vectorization),
      // and containsNull=false makes it provably dead code
      val guard =
        if (mayNull(left) || mayNull(right))
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
             |      ${ev.isNull} = true; break;
             |    }""".stripMargin
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $guard
         |    $s += (double) $a.$ga($i) * (double) $b.$gb($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance of two float vectors — the PQ codeword
  * assignment metric. Same kernel shape and numeric contract as
  * [[VecDot]]: left-to-right double accumulation of (xᵢ − yᵢ)², so
  * the DuckDB oracle's elementwise `list_reduce` fold matches bit for
  * bit; null on null input or length mismatch.
  */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2sq"

  private def elemGetter(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case _ => "getDouble"
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val rf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val nullable = mayNull(left) || mayNull(right)
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (nullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val ga = elemGetter(left)
      val gb = elemGetter(right)
      // same schema-gated null-bit probe as VecDot
      val guard =
        if (mayNull(left) || mayNull(right))
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
             |      ${ev.isNull} = true; break;
             |    }""".stripMargin
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $guard
         |    double $d = (double) $a.$ga($i) - (double) $b.$gb($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Euclidean norm of a float vector — same kernel shape as [[VecDot]]. */
case class VecNorm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  // nullable even over a non-null child: a NULL ELEMENT poisons the
  // result to NULL (the HOF-fold contract), same as VecDot/VecL2Sq
  override def nullable: Boolean = true
  override def prettyName: String = "vec_norm"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val f = isFloat
    val nullable = mayNull(child)
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (nullable && x.isNullAt(i)) return null
      val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val g = if (isFloat) "getFloat" else "getDouble"
      // same schema-gated null-bit probe as VecDot
      val guard =
        if (mayNull(child))
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard
         |  double $v = (double) $a.$g($i);
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Column wrappers over the native kernels (the sql-package half of
  * graft.functions.VectorFunctions).
  */
object VectorColumns {
  def vec_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def vec_norm(a: Column): Column =
    ExpressionUtils.column(VecNorm(ExpressionUtils.expression(a)))

  def vec_l2sq(a: Column, b: Column): Column =
    ExpressionUtils.column(VecL2Sq(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Arity-checked SQL builders — ONE list serving both registration
    * paths (imperative [[register]] and
    * `graft.functions.GraftExtensions`), so the wrong-arity guards
    * and the function set cannot drift between them: a wrong-arity
    * SQL call surfaces as an error naming the function, never an
    * IndexOutOfBoundsException from children(1).
    */
  def sqlBuilders: Seq[(String, String, Seq[Expression] => Expression)] = {
    def arity(name: String, n: Int)(cs: Seq[Expression])
        : Seq[Expression] = {
      if (cs.size != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument${if (n == 1) "" else "s"}, " +
            s"got ${cs.size}")
      cs
    }
    Seq(
      ("vec_dot", classOf[VecDot].getName,
        (cs: Seq[Expression]) => {
          val c = arity("vec_dot", 2)(cs); VecDot(c(0), c(1)): Expression
        }),
      ("vec_norm", classOf[VecNorm].getName,
        (cs: Seq[Expression]) =>
          VecNorm(arity("vec_norm", 1)(cs).head): Expression),
      ("vec_l2sq", classOf[VecL2Sq].getName,
        (cs: Seq[Expression]) => {
          val c = arity("vec_l2sq", 2)(cs); VecL2Sq(c(0), c(1)): Expression
        }),
      ("hilbert_index", classOf[HilbertIndex].getName,
        // fromChildren carries its own arity require
        (cs: Seq[Expression]) => HilbertColumns.fromChildren(cs)),
      ("nfc_normalize", classOf[NfcNormalize].getName,
        (cs: Seq[Expression]) =>
          NfcNormalize(arity("nfc_normalize", 1)(cs).head): Expression))
  }

  /** Imperative registration into an existing session's function
    * registry (idempotent) — for sessions built without
    * `spark.sql.extensions=graft.functions.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    val reg = spark.sessionState.functionRegistry
    sqlBuilders.foreach { case (name, cls, build) =>
      reg.registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(cls, name), build)
    }
  }
}
