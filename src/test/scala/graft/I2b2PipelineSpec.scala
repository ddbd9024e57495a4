package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.pipeline.{I2b2Config, I2b2Pipeline}

/** Golden-row acceptance test: the worked example for LOINC 4548-4 from
  * /root/reference/ETL_Task_Description.docx (C_HLEVEL=9, exact
  * C_FULLNAME, C_VISUALATTRIBUTES=LA, C_BASECODE=LOINC:4548-4), plus
  * the bug-compat C_FULLNAME mode (Angelo_ETL_Task.py:40).
  */
class I2b2PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val path4548 =
    "LP31756-7.LP30786-5.LP31617-1.LP14554-7.LP16412-6.LP16413-4.LP100945-7"

  private def loincFixture: DataFrame = Seq(
    ("4548-4", "Hemoglobin A1c/Hemoglobin.total", "MFr", "Pt", "Bld", "Qn",
      null, "ACTIVE"),
    ("LP100945-7", "Hemoglobin A1c", "-", "-", "-", "-", "-", "ACTIVE"),
    ("LP16413-4", "Hemoglobin A1c", "-", "-", "-", "-", "-", "ACTIVE"),
    ("9999-9", "Deprecated & <odd>", "P", "T", "S", "Ql", "M", "DEPRECATED"),
    ("1111-1", "Dup path", "P", "T", "S", "Ql", "M", "ACTIVE"))
    .toDF("LOINC_NUM", "COMPONENT", "PROPERTY", "TIME_ASPCT", "SYSTEM",
      "SCALE_TYP", "METHOD_TYP", "STATUS")

  private def hierFixture: DataFrame = Seq(
    ("LP31756-7", "Hematology", null, null, 1L),
    ("LP30786-5", "Hematology", null, "LP31756-7", 2L),
    ("LP31617-1", "Hemoglobin normal variant", null, "LP30786-5", 3L),
    ("LP14554-7", "Hemoglobin A", null, "LP31617-1", 4L),
    ("LP16412-6", "Hemoglobin A1", null, "LP14554-7", 5L),
    ("LP16413-4", "Hemoglobin A1c",
      "LP31756-7.LP30786-5.LP31617-1.LP14554-7.LP16412-6",
      "LP16412-6", 6L),
    ("LP100945-7", "Hemoglobin A1c",
      "LP31756-7.LP30786-5.LP31617-1.LP14554-7.LP16412-6.LP16413-4",
      "LP16413-4", 7L),
    ("4548-4", "Hgb A1c", path4548, "LP100945-7", 8L),
    ("9999-9", "Odd & <text>", "LP31756-7", "LP100945-7", 9L),
    // duplicate CODE rows: last in file order (seq) must win
    ("1111-1", "old text", "LP31756-7", "LP31756-7", 10L),
    ("1111-1", "new text", "LP31756-7.LP30786-5", "LP30786-5", 11L))
    .toDF("CODE", "CODE_TEXT", "PATH_TO_ROOT", "IMMEDIATE_PARENT", "seq")

  private val cfgSpec = I2b2Config(runTimestamp = "01-01-2026 00:00:00")

  private def row(df: DataFrame, code: String): Row =
    df.filter($"C_BASECODE" === s"LOINC:$code").collect().head

  lazy val out: DataFrame = {
    val df = I2b2Pipeline.build(loincFixture, hierFixture, cfgSpec)
    df.cache(); df
  }

  test("golden row 4548-4: C_HLEVEL = 9") {
    assert(row(out, "4548-4").getAs[Int]("C_HLEVEL") === 9)
  }

  test("golden row 4548-4: spec-correct C_FULLNAME") {
    val expected = "\\i2b2\\Laboratory" +
      "\\(LP31756-7) Hematology\\(LP30786-5) Hematology" +
      "\\(LP31617-1) Hemoglobin normal variant\\(LP14554-7) Hemoglobin A" +
      "\\(LP16412-6) Hemoglobin A1\\(LP16413-4) Hemoglobin A1c" +
      "\\(LP100945-7) Hemoglobin A1c\\(4548-4) Hgb A1c"
    assert(row(out, "4548-4").getAs[String]("C_FULLNAME") === expected)
  }

  test("golden row 4548-4: C_NAME concat with reference 'nan' token") {
    assert(row(out, "4548-4").getAs[String]("C_NAME") ===
      "Hemoglobin A1c/Hemoglobin.total:MFr:Pt:Bld:Qn:nan")
  }

  test("golden row 4548-4: leaf + active => C_VISUALATTRIBUTES = LA") {
    assert(row(out, "4548-4").getAs[String]("C_VISUALATTRIBUTES") === "LA")
  }

  test("folder classification: fan-out 2 => MAE, 1 => FAE, leaf+inactive => LI") {
    // LP100945-7 is IMMEDIATE_PARENT of 4548-4 and 9999-9 (fan-out 2)
    assert(row(out, "LP100945-7").getAs[String]("C_VISUALATTRIBUTES") === "MAE")
    // LP16413-4 is IMMEDIATE_PARENT of LP100945-7 only (fan-out 1)
    assert(row(out, "LP16413-4").getAs[String]("C_VISUALATTRIBUTES") === "FAE")
    assert(row(out, "9999-9").getAs[String]("C_VISUALATTRIBUTES") === "LI")
  }

  test("C_DIMCODE and C_TOOLTIP copy C_FULLNAME; C_PATH strips last segment") {
    val r = row(out, "4548-4")
    val full = r.getAs[String]("C_FULLNAME")
    assert(r.getAs[String]("C_DIMCODE") === full)
    assert(r.getAs[String]("C_TOOLTIP") === full)
    assert(r.getAs[String]("C_PATH") ===
      full.substring(0, full.lastIndexOf("\\")))
  }

  test("fixed literals and nulls match the DDL row shape") {
    val r = row(out, "4548-4")
    assert(r.getAs[String]("C_SYNONYM_CD") === "N")
    assert(r.getAs[String]("C_FACTTABLECOLUMN") === "CONCEPT_CD")
    assert(r.getAs[String]("C_TABLENAME") === "CONCEPT_DIMENSION")
    assert(r.getAs[String]("C_COLUMNNAME") === "CONCEPT_PATH")
    assert(r.getAs[String]("C_OPERATOR") === "LIKE")
    assert(r.getAs[String]("M_APPLIED_PATH") === "@")
    assert(r.getAs[String]("SOURCESYSTEM_CD") === "LOINC")
    assert(r.getAs[String]("VALUETYPE_CD") === "LAB")
    assert(r.isNullAt(r.fieldIndex("C_TOTALNUM")))
    assert(r.isNullAt(r.fieldIndex("C_COMMENT")))
    assert(r.isNullAt(r.fieldIndex("M_EXCLUSION_CD")))
    assert(r.getAs[String]("UPDATE_DATE") === "01-01-2026 00:00:00")
  }

  test("C_COLUMNDATATYPE: Qn => N else T") {
    assert(row(out, "4548-4").getAs[String]("C_COLUMNDATATYPE") === "N")
    assert(row(out, "9999-9").getAs[String]("C_COLUMNDATATYPE") === "T")
  }

  test("XML metadata escapes & < > like ElementTree; null renders str(nan)") {
    val xml = row(out, "9999-9").getAs[String]("C_METADATAXML")
    assert(xml.contains("<COMPONENT>Deprecated &amp; &lt;odd&gt;</COMPONENT>"))
    assert(xml.startsWith("<Loinc><LOINC_NUM>9999-9</LOINC_NUM>"))
    val lp = out.filter($"C_BASECODE" === "LOINC:LP100945-7").collect().head
    assert(lp.getAs[String]("C_METADATAXML") ===
      "<MultiAxialHierarchy><LOINC_NUM>LP100945-7</LOINC_NUM>" +
      "<CODE_TEXT>Hemoglobin A1c</CODE_TEXT></MultiAxialHierarchy>")
    // METHOD_TYP null for 4548-4: pandas read_csv yields NaN and the
    // reference's str() renders "nan" (Angelo_ETL_Task.py:111-115)
    assert(row(out, "4548-4").getAs[String]("C_METADATAXML")
      .contains("<METHOD_TYP>nan</METHOD_TYP>"))
  }

  test("last-wins dedup: duplicate CODE 1111-1 takes the seq=11 row") {
    val r = row(out, "1111-1")
    assert(r.getAs[String]("C_SYMBOL") === "new text")
    assert(r.getAs[Int]("C_HLEVEL") === 4) // 2 path elements + 2
  }

  test("bug-compat mode repeats the leaf name in every segment") {
    val bug = I2b2Pipeline.build(loincFixture, hierFixture,
      cfgSpec.copy(bugCompatFullname = true))
    val r = bug.filter($"C_BASECODE" === "LOINC:4548-4").collect().head
    val expected = "\\i2b2\\Laboratory" + (path4548.split("\\.") :+ "4548-4")
      .map(c => s"\\($c) Hgb A1c").mkString
    assert(r.getAs[String]("C_FULLNAME") === expected)
  }

  test("codes missing from the hierarchy are dropped by the null guard") {
    val extraLoinc = loincFixture.union(Seq(
      ("7777-7", "No hierarchy", "P", "T", "S", "Qn", "M", "ACTIVE"))
      .toDF(loincFixture.columns: _*))
    val df = I2b2Pipeline.build(extraLoinc, hierFixture, cfgSpec)
    assert(df.filter($"C_BASECODE" === "LOINC:7777-7").count() === 0)
  }

  test("a missing ancestor name nulls the whole spec C_FULLNAME (row dropped)") {
    val extraLoinc = loincFixture.union(Seq(
      ("8888-8", "Orphan path", "P", "T", "S", "Qn", "M", "ACTIVE"))
      .toDF(loincFixture.columns: _*))
    val extraHier = hierFixture.union(Seq(
      ("8888-8", "Orphan", "LP31756-7.MISSING-0", "MISSING-0", 12L))
      .toDF(hierFixture.columns: _*))
    // MISSING-0 has no hierarchy row, so its name is unknown: a
    // shortened path that silently skips the level would be wrong —
    // the whole C_FULLNAME must go null and the R5 guard drops the row.
    val df = I2b2Pipeline.build(extraLoinc, extraHier, cfgSpec)
    assert(df.filter($"C_BASECODE" === "LOINC:8888-8").count() === 0)
    // bug-compat mode renders only the leaf's own name, so it keeps
    // the row — the reference bug never reads ancestor names.
    val bug = I2b2Pipeline.build(extraLoinc, extraHier,
      cfgSpec.copy(bugCompatFullname = true))
    assert(bug.filter($"C_BASECODE" === "LOINC:8888-8").count() === 1)
  }

  test("output has exactly the 25 DDL columns in order") {
    assert(out.columns.toSeq === I2b2Pipeline.outputCols)
  }
}
