package graft.queries

/** DuckDB statement of the ENTIRE reference transform
  * (Angelo_ETL_Task.py:150-274) over the LoincShim views — the oracle
  * for the `i2b2_pipeline` flagship query. Mirrors, step for step:
  * last-wins dedup (R2), parent fan-out counts (R3), left join (R1),
  * the 25 derivations (F1-F13), null guard (R5), truncation (F14).
  */
object I2b2Oracle {

  /** ElementTree-order XML escape in SQL (& FIRST, then < and >) —
    * the escape order is load-bearing for oracle parity with
    * XmlRender.xmlEscape; ONE definition shared by every oracle
    * that renders C_METADATAXML.
    */
  private[queries] def esc(x: String): String =
    s"replace(replace(replace($x, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"

  /** Spec-correct rendering (per-ancestor names). */
  val sql: String = render(bugCompat = false)

  /** Reference-bug parity (Angelo_ETL_Task.py:40): every C_FULLNAME
    * segment carries the LEAF's own CODE_TEXT instead of the
    * ancestor's name.
    */
  val bugCompatSql: String = render(bugCompat = true)

  // NOTE: emitted into render()'s interpolated block BEFORE its
  // stripMargin runs — margins here use the outer '|' convention, and
  // no trimmed line may START with '||' (stripMargin would eat the
  // first pipe and turn concat into bitwise-or).
  private def fullnameExpr(bugCompat: Boolean): String =
    if (bugCompat)
      s"""'\\i2b2\\Laboratory\\' || array_to_string(
        |      list_transform(string_split(PATH_TO_ROOT, '.'),
        |                     w -> '(' || w || ') ' || CODE_TEXT), '\\') ||
        |      '\\(' || LOINC_NUM || ') ' || CODE_TEXT AS FULLNAME"""
    else
      s"""'\\i2b2\\Laboratory\\' || array_to_string(
        |      list_transform(string_split(PATH_TO_ROOT, '.'),
        |                     w -> '(' || w || ') cat ' || lower(w)), '\\') ||
        |      '\\(' || LOINC_NUM || ') ' || CODE_TEXT AS FULLNAME"""

  private def render(bugCompat: Boolean): String =
    LoincShim.oracleCtes.stripSuffix("\n") + "," +
    s"""
      |hier_last AS (
      |  SELECT CODE, CODE_TEXT, PATH_TO_ROOT FROM hier
      |  QUALIFY row_number() OVER (PARTITION BY CODE ORDER BY seq DESC) = 1),
      |parent_counts AS (
      |  SELECT IMMEDIATE_PARENT AS pcode, COUNT(*) AS child_count
      |  FROM hier WHERE IMMEDIATE_PARENT IS NOT NULL GROUP BY 1),
      |joined AS (
      |  SELECT l.*, h.CODE_TEXT, h.PATH_TO_ROOT, pc.child_count
      |  FROM loinc l
      |  LEFT JOIN hier_last h ON l.LOINC_NUM = h.CODE
      |  LEFT JOIN parent_counts pc ON l.LOINC_NUM = pc.pcode),
      |pre AS (
      |  SELECT *,
      |    ${fullnameExpr(bugCompat)}
      |  FROM joined),
      |derived AS (
      |  SELECT
      |    CAST(len(string_split(PATH_TO_ROOT, '.')) + 2 AS INT) AS C_HLEVEL,
      |    FULLNAME AS C_FULLNAME,
      |    CASE WHEN LOINC_NUM LIKE 'LP%' THEN CODE_TEXT
      |         ELSE coalesce(COMPONENT, 'nan') || ':' || coalesce(PROPERTY, 'nan')
      |           || ':' || coalesce(TIME_ASPCT, 'nan') || ':' || coalesce(SYSTEM, 'nan')
      |           || ':' || coalesce(SCALE_TYP, 'nan') || ':' || coalesce(METHOD_TYP, 'nan')
      |    END AS C_NAME,
      |    'N' AS C_SYNONYM_CD,
      |    (CASE WHEN child_count > 1 THEN 'M' WHEN child_count >= 1 THEN 'F' ELSE 'L' END)
      |      || (CASE WHEN STATUS = 'ACTIVE' THEN 'A' ELSE 'I' END)
      |      || (CASE WHEN child_count IS NOT NULL THEN 'E' ELSE '' END) AS C_VISUALATTRIBUTES,
      |    CAST(NULL AS INT) AS C_TOTALNUM,
      |    'LOINC:' || LOINC_NUM AS C_BASECODE,
      |    CASE WHEN LOINC_NUM LIKE 'LP%' THEN
      |      '<MultiAxialHierarchy><LOINC_NUM>' || ${esc("LOINC_NUM")} ||
      |      '</LOINC_NUM><CODE_TEXT>' || ${esc("coalesce(CODE_TEXT, 'None')")} ||
      |      '</CODE_TEXT></MultiAxialHierarchy>'
      |    ELSE
      |      '<Loinc><LOINC_NUM>' || ${esc("LOINC_NUM")} ||
      |      '</LOINC_NUM><COMPONENT>' || ${esc("coalesce(COMPONENT, 'nan')")} ||
      |      '</COMPONENT><SYSTEM>' || ${esc("coalesce(SYSTEM, 'nan')")} ||
      |      '</SYSTEM><METHOD_TYP>' || ${esc("coalesce(METHOD_TYP, 'nan')")} ||
      |      '</METHOD_TYP></Loinc>'
      |    END AS C_METADATAXML,
      |    'CONCEPT_CD' AS C_FACTTABLECOLUMN,
      |    'CONCEPT_DIMENSION' AS C_TABLENAME,
      |    'CONCEPT_PATH' AS C_COLUMNNAME,
      |    CASE WHEN SCALE_TYP = 'Qn' THEN 'N' ELSE 'T' END AS C_COLUMNDATATYPE,
      |    'LIKE' AS C_OPERATOR,
      |    FULLNAME AS C_DIMCODE,
      |    CAST(NULL AS VARCHAR) AS C_COMMENT,
      |    FULLNAME AS C_TOOLTIP,
      |    '@' AS M_APPLIED_PATH,
      |    '${CoreQueries.RunTs}' AS UPDATE_DATE,
      |    '${CoreQueries.RunTs}' AS DOWNLOAD_DATE,
      |    '${CoreQueries.RunTs}' AS IMPORT_DATE,
      |    'LOINC' AS SOURCESYSTEM_CD,
      |    'LAB' AS VALUETYPE_CD,
      |    CAST(NULL AS VARCHAR) AS M_EXCLUSION_CD,
      |    regexp_replace(FULLNAME, '\\\\[^\\\\]*$$', '') AS C_PATH,
      |    CODE_TEXT AS C_SYMBOL
      |  FROM pre),
      |filtered AS (
      |  SELECT * FROM derived
      |  WHERE C_HLEVEL IS NOT NULL
      |    AND C_FULLNAME IS NOT NULL AND C_FULLNAME <> ''
      |    AND C_NAME IS NOT NULL AND C_NAME <> ''
      |    AND C_SYNONYM_CD IS NOT NULL AND C_SYNONYM_CD <> ''
      |    AND C_VISUALATTRIBUTES IS NOT NULL AND C_VISUALATTRIBUTES <> ''
      |    AND C_FACTTABLECOLUMN IS NOT NULL AND C_FACTTABLECOLUMN <> ''
      |    AND C_TABLENAME IS NOT NULL AND C_TABLENAME <> ''
      |    AND C_COLUMNNAME IS NOT NULL AND C_COLUMNNAME <> ''
      |    AND C_COLUMNDATATYPE IS NOT NULL AND C_COLUMNDATATYPE <> ''
      |    AND C_OPERATOR IS NOT NULL AND C_OPERATOR <> ''
      |    AND C_DIMCODE IS NOT NULL AND C_DIMCODE <> ''
      |    AND M_APPLIED_PATH IS NOT NULL AND M_APPLIED_PATH <> ''
      |    AND UPDATE_DATE IS NOT NULL AND UPDATE_DATE <> '')
      |SELECT
      |  C_HLEVEL,
      |  substring(C_FULLNAME, 1, 700) AS C_FULLNAME,
      |  substring(C_NAME, 1, 2000) AS C_NAME,
      |  C_SYNONYM_CD, C_VISUALATTRIBUTES, C_TOTALNUM,
      |  substring(C_BASECODE, 1, 50) AS C_BASECODE,
      |  C_METADATAXML,
      |  substring(C_FACTTABLECOLUMN, 1, 50) AS C_FACTTABLECOLUMN,
      |  substring(C_TABLENAME, 1, 50) AS C_TABLENAME,
      |  substring(C_COLUMNNAME, 1, 50) AS C_COLUMNNAME,
      |  substring(C_COLUMNDATATYPE, 1, 50) AS C_COLUMNDATATYPE,
      |  substring(C_OPERATOR, 1, 10) AS C_OPERATOR,
      |  substring(C_DIMCODE, 1, 700) AS C_DIMCODE,
      |  C_COMMENT,
      |  substring(C_TOOLTIP, 1, 900) AS C_TOOLTIP,
      |  M_APPLIED_PATH, UPDATE_DATE, DOWNLOAD_DATE, IMPORT_DATE,
      |  SOURCESYSTEM_CD, VALUETYPE_CD, M_EXCLUSION_CD,
      |  substring(C_PATH, 1, 700) AS C_PATH,
      |  substring(C_SYMBOL, 1, 50) AS C_SYMBOL
      |FROM filtered""".stripMargin
}
