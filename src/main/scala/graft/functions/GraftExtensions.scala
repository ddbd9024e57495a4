package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{HilbertColumns, HilbertIndex, NfcNormalize, VecDot, VecL2Sq, VecNorm, VectorColumns}

/** Column-level entry points for the native vector kernels. */
object VectorFunctions {
  def vec_dot(a: Column, b: Column): Column = VectorColumns.vec_dot(a, b)

  def vec_norm(a: Column): Column = VectorColumns.vec_norm(a)

  def vec_l2sq(a: Column, b: Column): Column = VectorColumns.vec_l2sq(a, b)

  /** Register vec_dot/vec_norm/vec_l2sq in an existing session for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    VectorColumns.register(spark)
}

/** SparkSessionExtensions installer exposing the native kernels to
  * SQL: `spark.sql.extensions=graft.functions.GraftExtensions` makes
  * `vec_dot(a, b)` / `vec_norm(a)` callable from `spark.sql(...)`.
  * The DataFrame API path ([[VectorFunctions]]) needs no registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // arity checks BEFORE indexing children: a wrong-arity SQL call
    // must surface as an analysis-time error naming the function,
    // not an IndexOutOfBoundsException from children(1)
    def arity(name: String, n: Int)(children: Seq[Expression])
        : Seq[Expression] = {
      if (children.size != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument${if (n == 1) "" else "s"}, " +
            s"got ${children.size}")
      children
    }
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        val c = arity("vec_dot", 2)(children); VecDot(c(0), c(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      (children: Seq[Expression]) =>
        VecNorm(arity("vec_norm", 1)(children).head)))
    ext.injectFunction((
      FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[VecL2Sq].getName, "vec_l2sq"),
      (children: Seq[Expression]) => {
        val c = arity("vec_l2sq", 2)(children); VecL2Sq(c(0), c(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      (children: Seq[Expression]) => HilbertColumns.fromChildren(children)))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) =>
        NfcNormalize(arity("nfc_normalize", 1)(children).head)))
    // optimizer rule: nfc_normalize is idempotent — collapse nests
    ext.injectOptimizerRule(_ =>
      org.apache.spark.sql.graft.CollapseNfcNormalize)
  }
}
