package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Flag/classification derivations (SURVEY §2.3 F4, F7, F8, F9). */
object Flags {

  /** F4 — C_VISUALATTRIBUTES (Angelo_ETL_Task.py:60-87):
    * char1: the code appears as a parent => folder: fan-out > 1 => 'M'
    * (multiple children), == 1 => 'F'; not a parent => 'L' (leaf).
    * char2: STATUS == 'ACTIVE' => 'A' else 'I'.
    * char3: 'E' only for folders (editable container), absent for
    * leaves — so leaves get 2 chars, folders 3.
    * `childCount` is the (nullable) fan-out from the R3 group-by count
    * joined back on code; null means "never a parent".
    */
  def visualAttributes(childCount: Column, status: Column): Column =
    concat(
      when(childCount > 1, "M").when(childCount >= 1, "F").otherwise("L"),
      when(status === "ACTIVE", "A").otherwise("I"),
      when(childCount.isNotNull, "E").otherwise(""))

  /** F9 — C_COLUMNDATATYPE (Angelo_ETL_Task.py:215): quantitative
    * scale => numeric column, else text.
    */
  def columnDataType(scaleType: Column): Column =
    when(scaleType === "Qn", "N").otherwise("T")
}
