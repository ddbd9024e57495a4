// In the org.apache.spark.sql package tree: custom Expressions need
// sql-private API surface (ExpressionUtils for Column construction)
// that has no public equivalent in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash winnowing kernel (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03), called from generated code — a plain object so the
  * static forwarder is reachable from Janino-compiled Java.
  *
  * The gram hash is a double 31-bit polynomial hash combined into one
  * ~62-bit value:
  *
  *   h1 = Σ_j cp(pos+j) · B1^(k−1−j) mod P1   (h2 likewise, B2/P2)
  *   fp = h1 · P2 + h2
  *
  * computed in O(1) per position by the classic rolling update. Every
  * intermediate stays far below 2^63 (codepoint < 2^21, modulus < 2^31,
  * base < 2^9), so a DuckDB oracle reproduces the identical value with
  * plain BIGINT arithmetic via the positional sum — no md5 per gram,
  * which is what the previous winnowing pass paid (one digest + one
  * O(pos) substring per position).
  */
object WinnowKernel {
  /** 2^31 − 1 (Mersenne) and 2^31 − 19, both prime. */
  val P1 = 2147483647L
  val P2 = 2147483629L
  val B1 = 257L
  val B2 = 263L

  /** B^(k−1−j) mod P for j = 0..k−1 — the per-position power constants
    * the DuckDB oracle inlines as literals.
    */
  def powers(base: Long, p: Long, k: Int): IndexedSeq[Long] = {
    val out = new Array[Long](k)
    out(k - 1) = 1L
    var j = k - 2
    while (j >= 0) { out(j) = out(j + 1) * base % p; j -= 1 }
    out.toIndexedSeq
  }

  /** Winnowing fingerprints of one text chunk: the min gram hash of
    * each window of `w` consecutive k-grams, for window start
    * positions 1..nStarts (1-based, capped at the gram count).
    * Windows truncate at the end of the input — callers chunking a
    * longer document pass `nStarts` so truncation only ever happens at
    * the true end of the document, and give each chunk `w + k − 2`
    * characters of lookahead overlap. One O(len) pass: rolling gram
    * hashes into a monotonic-deque sliding minimum. The output is the
    * chunk's DISTINCT fingerprints in first-selection order (winnowing
    * emits long runs of the same min, and repetitive text re-selects
    * it from distant windows too); callers needing per-DOCUMENT
    * distinctness across chunks still `distinct` globally.
    */
  def fps(t: UTF8String, nStarts: Int, k: Int, w: Int): ArrayData = {
    val s = t.toString
    val cps = s.codePoints().toArray
    val g = cps.length - k + 1
    val m = math.min(nStarts, g)
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // gram hashes, rolling: pk = B^(k-1) mod P is the outgoing term
    var pk1 = 1L; var pk2 = 1L
    var j = 0
    while (j < k - 1) { pk1 = pk1 * B1 % P1; pk2 = pk2 * B2 % P2; j += 1 }
    val h = new Array[Long](g)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < k) { val c = cps(i); h1 = (h1 * B1 + c) % P1; h2 = (h2 * B2 + c) % P2; i += 1 }
    h(0) = h1 * P2 + h2
    var gi = 1
    while (gi < g) {
      val out = cps(gi - 1); val in = cps(gi + k - 1)
      h1 = ((h1 - out * pk1 % P1 + P1) % P1 * B1 + in) % P1
      h2 = ((h2 - out * pk2 % P2 + P2) % P2 * B2 + in) % P2
      h(gi) = h1 * P2 + h2
      gi += 1
    }
    // sliding min over [st, min(st+w-1, g-1)]: monotonic index deque
    val qi = new Array[Int](g)
    var qh = 0; var qt = 0
    val buf = new Array[Long](m)
    val seen = new java.util.HashSet[java.lang.Long](64)
    var n = 0
    var end = -1
    var st = 0
    while (st < m) {
      val e = math.min(st + w - 1, g - 1)
      while (end < e) {
        end += 1
        while (qt > qh && h(qi(qt - 1)) >= h(end)) qt -= 1
        qi(qt) = end; qt += 1
      }
      while (qi(qh) < st) qh += 1
      val v = h(qi(qh))
      // full per-chunk dedup (first occurrence), not just the
      // consecutive-run collapse: winnowing re-selects the same min
      // from non-adjacent windows of repetitive text, and every
      // consumer (global distinct, postings SET) treats the chunk's
      // fingerprints as a set anyway — deduping here shrinks the
      // exploded row count before any exchange exists
      if (n == 0 || buf(n - 1) != v) {
        if (seen.add(v)) { buf(n) = v; n += 1 }
      }
      st += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(buf, n))
  }
}

/** Winnowing fingerprint array of a text chunk — see [[WinnowKernel]].
  * Replaces an explode-per-gram + md5-per-gram + per-document window
  * shuffle with one codegen'd O(len) kernel call per chunk row: no
  * gram rows ever exist, and no sort-by-position exchange happens at
  * all. Value parity with the positional polynomial sum (the oracle
  * form) is asserted in ExtSpec.
  */
case class WinnowMins(child: Expression, nStarts: Expression,
                      k: Int, window: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(k >= 1 && window >= 1, "k and window must be positive")

  override def left: Expression = child
  override def right: Expression = nStarts
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_mins"

  override def nullSafeEval(s: Any, n: Any): Any =
    WinnowKernel.fps(s.asInstanceOf[UTF8String], n.asInstanceOf[Int], k, window)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.WinnowKernel.fps($a, $b, $k, $window)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowMins =
    copy(child = newLeft, nStarts = newRight)
}

object WinnowColumns {
  def winnow_mins(text: Column, nStarts: Column, k: Int, window: Int): Column =
    ExpressionUtils.column(WinnowMins(
      ExpressionUtils.expression(text), ExpressionUtils.expression(nStarts),
      k, window))
}
