package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic LOINC-shaped views over the driver's `part` test table
  * (TESTDATA.md), so the full i2b2 pipeline (and each of its operators)
  * can be exercised against the DuckDB oracle on the same parquet.
  *
  * Shape mirrors the reference inputs (Angelo_ETL_Task.py:144-145):
  * a `loinc` frame (one row per code) and a multi-row `hierarchy` frame
  * with duplicate CODEs (last-wins coverage, SURVEY R2), parent
  * fan-outs of 1 and 2 (folder 'F' vs 'M', SURVEY F4), LP* and
  * measurement codes (both F3/F6 branches), and NULL METHOD_TYP rows
  * (the reference's "nan"/"None" renderings).
  *
  * Every derivation is a closed-form expression over `part` columns so
  * the DuckDB oracle can state the exact same thing in SQL.
  */
object LoincShim {

  /** Code for a part: every 5th key is an 'LP' hierarchy code, the
    * rest are measurement-style 'NNN-D' codes.
    */
  def code(pk: Column): Column =
    when(pk % 5 === 0, concat(lit("LP"), pk.cast("string")))
      .otherwise(concat(pk.cast("string"), lit("-"), (pk % 10).cast("string")))

  /** Dot-path: p_type is the top category, p_name words the lower
    * levels, e.g. "ECONOMY.cold.widget".
    */
  def path(pType: Column, pName: Column): Column =
    concat(pType, lit("."), translate(pName, " ", "."))

  def loinc(part: DataFrame): DataFrame = {
    val pk = col("p_partkey")
    part.select(
      code(pk).as("LOINC_NUM"),
      col("p_name").as("COMPONENT"),
      col("p_brand").as("PROPERTY"),
      lit("PT").as("TIME_ASPCT"),
      col("p_type").as("SYSTEM"),
      when(pk % 2 === 0, "Qn").otherwise("Ql").as("SCALE_TYP"),
      when(pk % 7 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("METHOD"), (pk % 3).cast("string")))
        .as("METHOD_TYP"),
      when(pk % 3 === 0, "DEPRECATED").otherwise("ACTIVE").as("STATUS"))
  }

  /** Hierarchy rows: one base row per part; a second (last-wins
    * winning) row for pk%10==0 — two of which share an LP parent
    * ('M' folder) — and for pk%10==3 — each with a distinct parent
    * ('F' folder); plus one row per path word so spec-correct
    * C_FULLNAME can resolve every ancestor's name.
    *
    * Assembled as ONE scan emitting 1-3 struct rows per part row via
    * `inline(array_compact(...))` plus one scan for the distinct
    * ancestor names, instead of a 4-way union that re-scans part per
    * branch — the pipeline references this frame three times (dedup,
    * name resolution, parent counts), so plan size compounds.
    */
  def hierarchy(part: DataFrame): DataFrame = {
    val pk = col("p_partkey")
    def row(codeC: Column, text: Column, pathC: Column, parent: Column,
            seq: Column): Column =
      struct(codeC.as("CODE"), text.as("CODE_TEXT"),
        pathC.as("PATH_TO_ROOT"), parent.as("IMMEDIATE_PARENT"),
        seq.cast("long").as("seq"))
    val base = row(code(pk), col("p_name"),
      path(col("p_type"), col("p_name")),
      element_at(split(col("p_name"), " "), -1), pk)
    val dupPath = concat(path(col("p_type"), col("p_name")), lit(".EXTRA"))
    val dupText = concat(col("p_name"), lit(" v2"))
    val dupA = when(pk % 10 === 0, row(code(pk), dupText, dupPath,
      concat(lit("LP"), (pk - pk % 20 + 5).cast("string")),
      pk + 1000000L))
    val dupB = when(pk % 10 === 3, row(code(pk), dupText, dupPath,
      code(pk + 1), pk + 1000000L))
    val main = part.select(inline(array_compact(array(base, dupA, dupB))))
    val ancestors = part
      .select(explode(concat(
        split(col("p_name"), " "), array(col("p_type")))).as("w"))
      // the oracle adds 'EXTRA' unconditionally; a one-row local
      // relation matches that without scanning part again
      .union(part.sparkSession.range(1).select(lit("EXTRA").as("w")))
      .distinct()
      .select(
        col("w").as("CODE"),
        concat(lit("cat "), lower(col("w"))).as("CODE_TEXT"),
        lit(null).cast("string").as("PATH_TO_ROOT"),
        lit(null).cast("string").as("IMMEDIATE_PARENT"),
        lit(0L).as("seq"))
    main.union(ancestors)
  }

  /** DuckDB CTE prelude declaring the same `codes`, `loinc`, `hier`
    * views — prepended to oracle SQL bodies.
    */
  val oracleCtes: String =
    """WITH codes AS (
      |  SELECT p_partkey AS pk, p_name, p_brand, p_type, p_size,
      |    CASE WHEN p_partkey % 5 = 0 THEN 'LP' || CAST(p_partkey AS VARCHAR)
      |         ELSE CAST(p_partkey AS VARCHAR) || '-' || CAST(p_partkey % 10 AS VARCHAR) END AS code,
      |    p_type || '.' || replace(p_name, ' ', '.') AS path
      |  FROM part),
      |loinc AS (
      |  SELECT code AS LOINC_NUM, p_name AS COMPONENT, p_brand AS PROPERTY,
      |    'PT' AS TIME_ASPCT, p_type AS SYSTEM,
      |    CASE WHEN pk % 2 = 0 THEN 'Qn' ELSE 'Ql' END AS SCALE_TYP,
      |    CASE WHEN pk % 7 = 0 THEN NULL ELSE 'METHOD' || CAST(pk % 3 AS VARCHAR) END AS METHOD_TYP,
      |    CASE WHEN pk % 3 = 0 THEN 'DEPRECATED' ELSE 'ACTIVE' END AS STATUS
      |  FROM codes),
      |hier AS (
      |  SELECT code AS CODE, p_name AS CODE_TEXT, path AS PATH_TO_ROOT,
      |    string_split(p_name, ' ')[-1] AS IMMEDIATE_PARENT, CAST(pk AS BIGINT) AS seq
      |  FROM codes
      |  UNION ALL
      |  SELECT code, p_name || ' v2', path || '.EXTRA',
      |    'LP' || CAST(pk - pk % 20 + 5 AS VARCHAR), pk + 1000000 FROM codes WHERE pk % 10 = 0
      |  UNION ALL
      |  SELECT code, p_name || ' v2', path || '.EXTRA',
      |    CASE WHEN (pk+1) % 5 = 0 THEN 'LP' || CAST(pk+1 AS VARCHAR)
      |         ELSE CAST(pk+1 AS VARCHAR) || '-' || CAST((pk+1) % 10 AS VARCHAR) END,
      |    pk + 1000000 FROM codes WHERE pk % 10 = 3
      |  UNION ALL
      |  SELECT w, 'cat ' || lower(w), NULL, NULL, 0 FROM (
      |    SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part
      |    UNION SELECT DISTINCT p_type FROM part
      |    UNION SELECT 'EXTRA'))
      |""".stripMargin
}
