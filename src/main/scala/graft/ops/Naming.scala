package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Name/code derivation operators (SURVEY §2.3 F3, F5, F13). */
object Naming {

  /** F3 — conditional display name (Angelo_ETL_Task.py:50-57):
    * `LP*` part codes use the hierarchy `CODE_TEXT`; measurement codes
    * use `COMPONENT:PROPERTY:TIME_ASPCT:SYSTEM:SCALE_TYP:METHOD_TYP`.
    * The reference builds the concat with pandas `astype(str)`
    * (:169-170), which renders missing values as the literal string
    * "nan" — `nullToken` reproduces or overrides that (SURVEY §7 hard
    * part 3). `concat_ws` would silently SKIP nulls, changing the
    * segment count, so each part is coalesced explicitly.
    */
  def conditionalName(code: Column, codeText: Column, parts: Seq[Column],
                      nullToken: String = "nan"): Column = {
    val joined = concat_ws(":",
      parts.map(p => coalesce(p.cast("string"), lit(nullToken))): _*)
    when(code.startsWith("LP"), codeText).otherwise(joined)
  }

  /** F5 — prefixed basecode (Angelo_ETL_Task.py:205): 'LOINC:' + code. */
  def baseCode(code: Column, prefix: String = "LOINC:"): Column =
    concat(lit(prefix), code)

  /** F13 — symbol = the code's own display text (Angelo_ETL_Task.py:241);
    * after the R1 join this is just the joined CODE_TEXT column.
    */
  def symbol(codeText: Column): Column = codeText
}
