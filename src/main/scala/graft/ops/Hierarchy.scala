package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Materialized-path hierarchy operators.
  *
  * The reference stores the LOINC multi-axial tree as a dot-separated
  * path string (`PATH_TO_ROOT`) and does all tree work with string ops
  * (SURVEY §1.1). We keep that representation: a path is a
  * `StringType` column split into `ArrayType(StringType)` on demand,
  * and every operator below is a pure Catalyst expression (codegen'd,
  * no UDF, no shuffle).
  */
object Hierarchy {

  /** Root prefix of every rendered path (Angelo_ETL_Task.py:34). */
  val RootPrefix = "\\i2b2\\Laboratory"

  /** F1 — hierarchy depth (Angelo_ETL_Task.py:192):
    * `path.count('.') + 3` = #ancestors + self + the two fixed root
    * levels. n dots => n+1 path elements => size(split)+2.
    */
  def depth(pathToRoot: Column): Column =
    (size(split(pathToRoot, "\\.")) + 2).as("C_HLEVEL")

  /** Path string -> array of ancestor codes, root-first. */
  def pathArray(pathToRoot: Column): Column = split(pathToRoot, "\\.")

  /** F2 (spec-correct) — render `\i2b2\Laboratory\(code1) name1\...`
    * with each segment carrying the segment's OWN name
    * (ETL_Task_Description.docx worked example for 4548-4).
    * `nameOf` maps an ancestor-code column to its display name.
    */
  def renderPath(pathToRoot: Column, leafCode: Column,
                 nameOf: Column => Column): Column = {
    val codes = concat(pathArray(pathToRoot), array(leafCode))
    val segs = transform(codes, c => concat(lit("("), c, lit(") "), nameOf(c)))
    concat(lit(RootPrefix + "\\"), array_join(segs, "\\"))
  }

  /** F2 (bug-compat) — reference bug at Angelo_ETL_Task.py:40: inside
    * the per-ancestor loop it looks up the LEAF's name for every
    * segment, so all segments repeat the leaf's own name.
    */
  def renderPathBugCompat(pathToRoot: Column, leafCode: Column,
                          leafName: Column): Column =
    renderPath(pathToRoot, leafCode, _ => leafName)

  /** F12 — parent path (Angelo_ETL_Task.py:239): strip the last
    * `\segment` of a rendered path (`path[:path.rfind('\\')]`).
    */
  def parentPath(fullname: Column): Column =
    regexp_replace(fullname, "\\\\[^\\\\]*$", "")
}
