package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F6 — per-row XML document rendering (Angelo_ETL_Task.py:89-120).
  *
  * The reference builds a small XML doc per row with ElementTree,
  * which escapes `& < >` in text nodes. We render with pure string
  * expressions (codegen'd, stays inside WholeStageCodegen) and apply
  * the same escaping; `to_xml` exists in Spark 4 but its
  * self-closing/empty-element conventions differ from ElementTree, so
  * explicit concat is both faster and parity-exact.
  */
object XmlRender {

  /** ElementTree text-node escaping: & first, then < and >. */
  def xmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** One `<tag>escaped(value)</tag>` element.
    *
    * @param nullToken rendered for null values. The reference's
    *   str()-wrapped fields (Angelo_ETL_Task.py:111-115) hold pandas
    *   NaN when the CSV cell is missing, and `str(nan)` renders "nan"
    *   — the same token F3's astype(str) produces — so those call
    *   sites pass "nan". The default "None" is for fields the
    *   reference never str()-wraps (it would crash on a missing
    *   value, so any token is a deviation; "None" = `str(None)`).
    */
  def element(tag: String, value: Column, nullToken: String = "None"): Column =
    concat(lit(s"<$tag>"),
      xmlEscape(coalesce(value.cast("string"), lit(nullToken))),
      lit(s"</$tag>"))

  /** `<root>children...</root>` document. */
  def document(root: String, children: Column*): Column =
    concat((lit(s"<$root>") +: children :+ lit(s"</$root>")): _*)
}
