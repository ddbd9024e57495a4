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

/** NFC kernel behind [[NfcNormalize]]; called from generated code.
  * Fast path: `Normalizer.isNormalized` is a cheap scan (most
  * real-world text IS already NFC), so the common row pays no
  * String materialization or re-encode — only rows carrying
  * decomposed sequences allocate.
  */
object GraftUnicodeUtil {
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // MALFORMED input must not pick its output by fast-path luck:
    // toString decodes invalid bytes to U+FFFD, so a composed-é +
    // stray-0xFF string reads isNormalized=true and returns its RAW
    // bytes, while the decomposed spelling of the same canonical
    // text re-encodes through the replacement char — byte-DIFFERENT
    // outputs for canonically-equal inputs, silently defeating the
    // hash-keyed dedup this kernel exists to enable. Any decoded
    // U+FFFD forces the re-encode path, so every spelling of a
    // malformed string canonicalizes to the same bytes (genuine
    // U+FFFD text pays only the allocation, never wrong bytes).
    if (str.indexOf('�') < 0 &&
        java.text.Normalizer.isNormalized(str,
          java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * codegen'd unary expression — the canonicalization step a corpus
  * pipeline runs BEFORE any hash-keyed operation (exact dedup,
  * MinHash shingles, URL keys): "é" as U+0065 U+0301 and as U+00E9
  * are byte-different, so unnormalized text silently defeats
  * hash-based dedup on any corpus that mixes sources. The JDK
  * Normalizer implements the Unicode canonical-composition tables —
  * public, deterministic, engine-portable (DuckDB's nfc_normalize
  * mirrors it for the oracle).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    GraftUnicodeUtil.nfcNormalize(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftUnicodeUtil.nfcNormalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object UnicodeColumns {
  def nfc_normalize(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))
}

/** Optimizer rule: collapse `nfc_normalize(nfc_normalize(x))` to one
  * application — NFC is idempotent by construction (UAX #15), and
  * composed pipelines double-normalize routinely (a library operator
  * defensively normalizes input that a caller already normalized).
  * Each collapsed application saves a full isNormalized scan per row,
  * which at corpus scale is a whole pass over the text bytes.
  *
  * The graft engine's third Catalyst extension point, next to the
  * injected functions and the as-of join SparkStrategy: registered
  * through `SparkSessionExtensions.injectOptimizerRule` (see
  * graft.functions.GraftExtensions).
  */
object CollapseNfcNormalize
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalize(inner @ NfcNormalize(_)) => inner
    }
}
