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

  // -------------------------------------------------------------------
  // Multi-row golden set (round-13 VERDICT item 7): the closest
  // achievable stand-in for the reference's unmaterialized
  // ETL_Task_Output.csv — an 18-code fixture slice whose expected
  // derived columns are HAND-WRITTEN literals (never re-derived via
  // the code under test), asserted in BOTH F2 modes.
  // -------------------------------------------------------------------

  private val longText = // 60 chars: exercises the C_SYMBOL 50-cap
    "X234567890123456789012345678901234567890123456789012345678Z"

  private def goldenLoinc: DataFrame = Seq(
    // leaves under LPC-3, one null per metadata position
    ("1000-1", "Alpha", "Mass", "Pt", "Ser", "Qn", "EIA", "ACTIVE"),
    ("1000-2", "Beta", null, "Pt", "Ser", "Ql", null, "ACTIVE"),
    ("1000-3", "Delta", "Mass", "Pt", "Ser", "Ql", "EIA", "DEPRECATED"),
    ("1400-1", null, "Mass", "Pt", "Ser", "Qn", "EIA", "ACTIVE"),
    ("1500-1", "Alpha", "Mass", null, "Ser", "Qn", "EIA", "ACTIVE"),
    ("1600-1", "Alpha", "Mass", "Pt", null, "Qn", "EIA", "ACTIVE"),
    ("1700-1", "Alpha", "Mass", "Pt", "Ser", null, "EIA", "ACTIVE"),
    ("1800-1", "Alpha", "Mass", "Pt", "Ser", "Qn", "EIA", null),
    ("2000-2", "Eps", "Conc", "24H", "Ur", "Qn", "Calc", "ACTIVE"),
    ("3000-3", "Zeta", "Conc", "Pt", "Plas", "Ql", null, "DEPRECATED"),
    ("6000-6", "Theta", "Mass", "Pt", "Ser", "Qn", "EIA", "ACTIVE"),
    ("7000-7", "Iota", "Mass", "Pt", "Ser", "Qn", "EIA", "ACTIVE"),
    // folders (LP codes: C_NAME = hierarchy CODE_TEXT)
    ("LPB-2", "-", "-", "-", "-", "-", "-", "ACTIVE"),
    ("LPC-3", "-", "-", "-", "-", "-", "-", "ACTIVE"),
    ("LPD-4", "-", "-", "-", "-", "-", "-", "ACTIVE"),
    ("LPE-5", "-", "-", "-", "-", "-", "-", "DEPRECATED"),
    // no hierarchy row at all -> dropped in both modes
    ("4000-4", "NoHier", "Mass", "Pt", "Ser", "Qn", "EIA", "ACTIVE"),
    // ancestor missing from the hierarchy -> dropped in spec mode only
    ("5000-5", "Orph", "Mass", "Pt", "Ser", "Qn", "EIA", "ACTIVE"))
    .toDF("LOINC_NUM", "COMPONENT", "PROPERTY", "TIME_ASPCT", "SYSTEM",
      "SCALE_TYP", "METHOD_TYP", "STATUS")

  private def goldenHier: DataFrame = Seq(
    ("LPR-1", "Root A", null, null, 1L),
    ("LPB-2", "Branch B", "LPR-1", "LPR-1", 2L),
    ("LPC-3", "Class C", "LPR-1.LPB-2", "LPB-2", 3L),
    ("LPD-4", "Class D", "LPR-1.LPB-2", "LPB-2", 4L),
    ("LPE-5", "Branch E & <x>", "LPR-1", "LPR-1", 5L),
    ("1000-1", "L one", "LPR-1.LPB-2.LPC-3", "LPC-3", 6L),
    ("1000-2", "L two", "LPR-1.LPB-2.LPC-3", "LPC-3", 7L),
    ("1000-3", "L three", "LPR-1.LPB-2.LPC-3", "LPC-3", 8L),
    ("1400-1", "L nc", "LPR-1.LPB-2.LPC-3", "LPC-3", 9L),
    ("1500-1", "L nt", "LPR-1.LPB-2.LPC-3", "LPC-3", 10L),
    ("1600-1", "L ns", "LPR-1.LPB-2.LPC-3", "LPC-3", 11L),
    ("1700-1", "L nq", "LPR-1.LPB-2.LPC-3", "LPC-3", 12L),
    ("1800-1", "L nst", "LPR-1.LPB-2.LPC-3", "LPC-3", 13L),
    ("2000-2", "Two leaf", "LPR-1.LPB-2.LPD-4", "LPD-4", 14L),
    ("3000-3", "Gamma & <g>", "LPR-1.LPE-5", "LPE-5", 15L),
    // duplicate CODE: the seq=21 row must win text AND path
    ("6000-6", "Old six", "LPR-1.LPB-2", "LPB-2", 20L),
    ("6000-6", "New six", "LPR-1.LPB-2.LPC-3", "LPC-3", 21L),
    ("7000-7", longText, "LPR-1.LPB-2.LPC-3", "LPC-3", 22L),
    ("5000-5", "Orphan leaf", "LPR-1.LPMISS-0", "LPMISS-0", 23L))
    .toDF("CODE", "CODE_TEXT", "PATH_TO_ROOT", "IMMEDIATE_PARENT", "seq")

  private val P = "\\i2b2\\Laboratory"
  private val viaC = // shared ancestor chain of the LPC-3 leaves
    P + "\\(LPR-1) Root A\\(LPB-2) Branch B\\(LPC-3) Class C"

  // code -> (C_HLEVEL, C_FULLNAME, C_NAME, C_VISUALATTRIBUTES,
  //          C_COLUMNDATATYPE, C_SYMBOL) — spec-correct F2 mode
  private val goldenSpec: Map[String, (Int, String, String, String,
      String, String)] = Map(
    "1000-1" -> ((5, viaC + "\\(1000-1) L one",
      "Alpha:Mass:Pt:Ser:Qn:EIA", "LA", "N", "L one")),
    "1000-2" -> ((5, viaC + "\\(1000-2) L two",
      "Beta:nan:Pt:Ser:Ql:nan", "LA", "T", "L two")),
    "1000-3" -> ((5, viaC + "\\(1000-3) L three",
      "Delta:Mass:Pt:Ser:Ql:EIA", "LI", "T", "L three")),
    "1400-1" -> ((5, viaC + "\\(1400-1) L nc",
      "nan:Mass:Pt:Ser:Qn:EIA", "LA", "N", "L nc")),
    "1500-1" -> ((5, viaC + "\\(1500-1) L nt",
      "Alpha:Mass:nan:Ser:Qn:EIA", "LA", "N", "L nt")),
    "1600-1" -> ((5, viaC + "\\(1600-1) L ns",
      "Alpha:Mass:Pt:nan:Qn:EIA", "LA", "N", "L ns")),
    "1700-1" -> ((5, viaC + "\\(1700-1) L nq",
      "Alpha:Mass:Pt:Ser:nan:EIA", "LA", "T", "L nq")),
    "1800-1" -> ((5, viaC + "\\(1800-1) L nst",
      "Alpha:Mass:Pt:Ser:Qn:EIA", "LI", "N", "L nst")),
    "2000-2" -> ((5, P + "\\(LPR-1) Root A\\(LPB-2) Branch B" +
      "\\(LPD-4) Class D\\(2000-2) Two leaf",
      "Eps:Conc:24H:Ur:Qn:Calc", "LA", "N", "Two leaf")),
    "3000-3" -> ((4, P + "\\(LPR-1) Root A\\(LPE-5) Branch E & <x>" +
      "\\(3000-3) Gamma & <g>",
      "Zeta:Conc:Pt:Plas:Ql:nan", "LI", "T", "Gamma & <g>")),
    "6000-6" -> ((5, viaC + "\\(6000-6) New six",
      "Theta:Mass:Pt:Ser:Qn:EIA", "LA", "N", "New six")),
    "7000-7" -> ((5, viaC + s"\\(7000-7) $longText",
      "Iota:Mass:Pt:Ser:Qn:EIA", "LA", "N", longText.take(50))),
    "LPB-2" -> ((3, P + "\\(LPR-1) Root A\\(LPB-2) Branch B",
      "Branch B", "MAE", "T", "Branch B")),
    "LPC-3" -> ((4, viaC, "Class C", "MAE", "T", "Class C")),
    "LPD-4" -> ((4, P + "\\(LPR-1) Root A\\(LPB-2) Branch B" +
      "\\(LPD-4) Class D", "Class D", "FAE", "T", "Class D")),
    "LPE-5" -> ((3, P + "\\(LPR-1) Root A\\(LPE-5) Branch E & <x>",
      "Branch E & <x>", "FIE", "T", "Branch E & <x>")))

  // bug-compat F2 pins (every segment repeats the LEAF's name),
  // including the orphan-ancestor row that only this mode keeps
  private val goldenBug: Map[String, String] = Map(
    "1000-1" -> (P + "\\(LPR-1) L one\\(LPB-2) L one\\(LPC-3) L one" +
      "\\(1000-1) L one"),
    "3000-3" -> (P + "\\(LPR-1) Gamma & <g>\\(LPE-5) Gamma & <g>" +
      "\\(3000-3) Gamma & <g>"),
    "6000-6" -> (P + "\\(LPR-1) New six\\(LPB-2) New six" +
      "\\(LPC-3) New six\\(6000-6) New six"),
    "5000-5" -> (P + "\\(LPR-1) Orphan leaf\\(LPMISS-0) Orphan leaf" +
      "\\(5000-5) Orphan leaf"),
    "LPE-5" -> (P + "\\(LPR-1) Branch E & <x>" +
      "\\(LPE-5) Branch E & <x>"))

  test("multi-row golden set, spec mode: 16 surviving rows match the " +
      "hand-written derived columns exactly") {
    val df = I2b2Pipeline.build(goldenLoinc, goldenHier, cfgSpec)
    val got = df.collect().map(r =>
      r.getAs[String]("C_BASECODE").stripPrefix("LOINC:") -> r).toMap
    assert(got.keySet === goldenSpec.keySet) // 4000-4 / 5000-5 dropped
    for ((code, (lvl, full, name, vis, dt, sym)) <- goldenSpec) {
      val r = got(code)
      assert(r.getAs[Int]("C_HLEVEL") === lvl, s"$code C_HLEVEL")
      assert(r.getAs[String]("C_FULLNAME") === full, s"$code C_FULLNAME")
      assert(r.getAs[String]("C_NAME") === name, s"$code C_NAME")
      assert(r.getAs[String]("C_VISUALATTRIBUTES") === vis, s"$code vis")
      assert(r.getAs[String]("C_COLUMNDATATYPE") === dt, s"$code dtype")
      assert(r.getAs[String]("C_SYMBOL") === sym, s"$code C_SYMBOL")
      assert(r.getAs[String]("C_DIMCODE") === full, s"$code C_DIMCODE")
      assert(r.getAs[String]("C_TOOLTIP") === full, s"$code C_TOOLTIP")
      assert(r.getAs[String]("C_PATH") ===
        full.substring(0, full.lastIndexOf("\\")), s"$code C_PATH")
    }
  }

  test("multi-row golden set, bug-compat mode: leaf-name segments, " +
      "orphan-ancestor row kept, all other derived columns unchanged") {
    val df = I2b2Pipeline.build(goldenLoinc, goldenHier,
      cfgSpec.copy(bugCompatFullname = true))
    val got = df.collect().map(r =>
      r.getAs[String]("C_BASECODE").stripPrefix("LOINC:") -> r).toMap
    // bug mode keeps 5000-5 (never reads ancestor names), still drops
    // 4000-4 (no hierarchy row at all)
    assert(got.keySet === goldenSpec.keySet + "5000-5")
    for ((code, full) <- goldenBug) {
      assert(got(code).getAs[String]("C_FULLNAME") === full,
        s"$code bug-compat C_FULLNAME")
      assert(got(code).getAs[String]("C_PATH") ===
        full.substring(0, full.lastIndexOf("\\")), s"$code C_PATH")
    }
    // non-F2 columns are mode-independent
    for ((code, (lvl, _, name, vis, dt, sym)) <- goldenSpec) {
      val r = got(code)
      assert(r.getAs[Int]("C_HLEVEL") === lvl, s"$code C_HLEVEL")
      assert(r.getAs[String]("C_NAME") === name, s"$code C_NAME")
      assert(r.getAs[String]("C_VISUALATTRIBUTES") === vis, s"$code vis")
      assert(r.getAs[String]("C_COLUMNDATATYPE") === dt, s"$code dtype")
      assert(r.getAs[String]("C_SYMBOL") === sym, s"$code C_SYMBOL")
    }
    // the orphan row's own metadata in the kept mode
    assert(got("5000-5").getAs[Int]("C_HLEVEL") === 4)
    assert(got("5000-5").getAs[String]("C_SYMBOL") === "Orphan leaf")
  }
}
