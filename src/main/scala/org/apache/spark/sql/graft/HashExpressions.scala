// In the org.apache.spark.sql package tree: custom Expressions need
// sql-private API surface (ExpressionUtils for Column construction)
// that has no public equivalent in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Digest-to-long helper for [[Md5PrefixLong]]. Called from generated
  * code, so it lives in a plain object with a static forwarder. One
  * MessageDigest per thread — `MessageDigest.getInstance` per row is
  * measurable at corpus scale.
  */
object GraftHashUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The first `hexLen` hex chars of md5(s), as an unsigned long —
    * bit-identical to `conv(substring(md5(s), 1, hexLen), 16, 10)`:
    * hex char i is the high (even i) or low (odd i) nibble of digest
    * byte i/2, folded big-endian.
    */
  def md5PrefixLong(s: UTF8String, hexLen: Int): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < hexLen) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}

/** Native form of the engine's portable-hash idiom (see
  * graft.ext.PortableHash): a long from the first `hexLen` hex chars
  * of md5. The built-in composition `conv(substring(md5(c), 1, n),
  * 16, 10)` materializes a 32-char hex string, a substring of it, and
  * a radix-parsed copy per row — three string allocations on the
  * hottest path of every dedup signature and sampling bucket. This
  * expression goes digest → long directly and stays inside
  * WholeStageCodegen. Value parity with the built-in form is asserted
  * bit-for-bit in ExtSpec ("native md5PrefixLong matches the
  * conv/substring builtin form"), and the DuckDB oracle rendering
  * (`CAST('0x' || substr(md5(x), 1, n) AS BIGINT)`) is unchanged.
  */
case class Md5PrefixLong(child: Expression, hexLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(hexLen >= 1 && hexLen <= 15, "1..15 hex chars fit a long")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override def nullSafeEval(s: Any): Any =
    GraftHashUtil.md5PrefixLong(s.asInstanceOf[UTF8String], hexLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftHashUtil.md5PrefixLong($c, $hexLen)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5PrefixLong = copy(child = newChild)
}

object HashColumns {
  def md5_prefix_long(c: Column, hexLen: Int): Column =
    ExpressionUtils.column(Md5PrefixLong(ExpressionUtils.expression(c), hexLen))
}

/** `Observation.getOrEmpty` is private[sql]; this bridge exposes the
  * non-blocking read to the iterative operators (graft.ext.DedupOps)
  * that poll a checkpoint job's observed metrics with a fallback,
  * rather than risking an indefinite block on `Observation.get`.
  */
/** Reliable-checkpoint files of SUPERSEDED iterative rounds are never
  * cleaned under default config
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` is false), so a
  * 40-round contraction would leave ~80 edge-set copies in the
  * checkpoint bucket. This bridge reaches the `LogicalRDD` behind a
  * `Dataset.checkpoint` result and deletes its files once the round's
  * output has been checkpointed past — best effort: a delete failure
  * only leaves garbage, never breaks the computation.
  */
object CheckpointFiles {
  def delete(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach { rdd =>
      rdd.getCheckpointFile.foreach { path =>
        try {
          val p = new org.apache.hadoop.fs.Path(path)
          p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
          ()
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
}

object ObservationAccess {
  def getOrEmpty(o: org.apache.spark.sql.Observation): Map[String, Any] =
    o.getOrEmpty

  /** Poll for the observed metrics row after an action has returned:
    * the listener bus delivers it asynchronously, typically within
    * milliseconds. None after `timeoutMs` — callers fall back to an
    * explicit recompute instead of blocking forever.
    */
  def await(o: org.apache.spark.sql.Observation,
            timeoutMs: Long): Option[Map[String, Any]] = {
    var waited = 0L
    var got = o.getOrEmpty
    while (got.isEmpty && waited < timeoutMs) {
      Thread.sleep(5); waited += 5
      got = o.getOrEmpty
    }
    if (got.isEmpty) None else Some(got)
  }
}
