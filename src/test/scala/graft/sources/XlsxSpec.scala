package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec
import org.apache.spark.sql.types._

/** The spec ships its own minimal SpreadsheetML WRITER (zip + XML by
  * hand) so the reader is exercised against real workbook structure —
  * shared strings, inline strings, rich-text runs, numbers, booleans,
  * sparse rows — without any xlsx library in the environment. */
class XlsxSpec extends SparkSpec {

  private def esc(s: String) =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Cells: Left(sharedStringIndex is managed here) for strings,
    * Right(rawXml) for anything else; None = blank (absent) cell. */
  private def writeXlsx(file: java.io.File, rows: Seq[Seq[Option[(String, String)]]],
      richTextRun: Boolean = false): Unit = {
    val sharedVals = scala.collection.mutable.LinkedHashMap[String, Int]()
    def sharedIdx(s: String) = sharedVals.getOrElseUpdate(s, sharedVals.size)
    def ref(r: Int, c: Int): String = {
      var n = c + 1; var s = ""
      while (n > 0) { s = ('A' + (n - 1) % 26).toChar.toString + s; n = (n - 1) / 26 }
      s + (r + 1)
    }
    val sheetRows = rows.zipWithIndex.map { case (cells, r) =>
      val cs = cells.zipWithIndex.collect { case (Some((t, v)), c) =>
        t match {
          case "s"   => s"""<c r="${ref(r, c)}" t="s"><v>${sharedIdx(v)}</v></c>"""
          case "is"  => s"""<c r="${ref(r, c)}" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
          case "n"   => s"""<c r="${ref(r, c)}"><v>$v</v></c>"""
          case "b"   => s"""<c r="${ref(r, c)}" t="b"><v>$v</v></c>"""
          case "str" => s"""<c r="${ref(r, c)}" t="str"><v>${esc(v)}</v></c>"""
        }
      }.mkString
      s"""<row r="${r + 1}">$cs</row>"""
    }.mkString
    val sheetXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$sheetRows</sheetData></worksheet>""".stripMargin
    val ssXml = {
      val sis = sharedVals.keys.map { s =>
        if (richTextRun && s.contains(" "))
          // rich-text: the string split across two runs, must concatenate
          s.split(" ", 2) match {
            case Array(a, b) => s"<si><r><t xml:space=\"preserve\">${esc(a)} </t></r><r><t>${esc(b)}</t></r></si>"
          }
        else s"<si><t>${esc(s)}</t></si>"
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedVals.size}" uniqueCount="${sharedVals.size}">$sis</sst>""".stripMargin
    }
    val workbookXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/></sheets></workbook>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/></Types>""".stripMargin
    val zout = new ZipOutputStream(new FileOutputStream(file))
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    put("[Content_Types].xml", contentTypes)
    put("xl/workbook.xml", workbookXml)
    put("xl/sharedStrings.xml", ssXml)
    put("xl/worksheets/sheet1.xml", sheetXml)
    zout.close()
  }

  private val schema = StructType(Seq(
    StructField("company_name", StringType),
    StructField("website", StringType),
    StructField("employees", LongType),
    StructField("score", DoubleType),
    StructField("active", BooleanType)))

  private def s(v: String) = Some(("s", v))
  private def header = Seq(s("company_name"), s("website"), s("employees"), s("score"), s("active"))

  test("reads shared/inline/str strings, numbers, booleans; blanks are null; header maps by name") {
    val dir = Files.createTempDirectory("xlsx").toFile
    writeXlsx(new java.io.File(dir, "companies.xlsx"), Seq(
      header,
      Seq(s("Acme & Sons"), Some(("is", "https://acme.example")), Some(("n", "250")), Some(("n", "0.5")), Some(("b", "1"))),
      Seq(Some(("str", "Globex")), None, Some(("n", "3.0")), None, Some(("b", "0")))))
    // schema field order ≠ sheet column order is fine — mapping is by header name
    val shuffled = StructType(schema.fields.reverse)
    val out = Xlsx.read(spark, dir.getAbsolutePath, shuffled)
      .orderBy("company_name").collect()
    out.length shouldEqual 2
    val acme = out.head
    acme.getAs[String]("company_name") shouldEqual "Acme & Sons" // XML unescaped
    acme.getAs[String]("website") shouldEqual "https://acme.example"
    acme.getAs[Long]("employees") shouldEqual 250L
    acme.getAs[Double]("score") shouldEqual 0.5
    acme.getAs[Boolean]("active") shouldEqual true
    val globex = out(1)
    globex.getAs[String]("company_name") shouldEqual "Globex"
    globex.isNullAt(globex.fieldIndex("website")) shouldEqual true  // absent cell
    globex.getAs[Long]("employees") shouldEqual 3L                  // "3.0" numeric text
    globex.isNullAt(globex.fieldIndex("score")) shouldEqual true
    globex.getAs[Boolean]("active") shouldEqual false
  }

  test("rich-text shared strings concatenate their runs") {
    val dir = Files.createTempDirectory("xlsx-rich").toFile
    writeXlsx(new java.io.File(dir, "r.xlsx"), Seq(
      Seq(s("company_name")),
      Seq(s("Initech Industrial"))), richTextRun = true)
    val one = StructType(Seq(StructField("company_name", StringType)))
    Xlsx.read(spark, dir.getAbsolutePath, one).collect()
      .head.getString(0) shouldEqual "Initech Industrial"
  }

  test("a missing required column fails fast with the header names") {
    val dir = Files.createTempDirectory("xlsx-miss").toFile
    writeXlsx(new java.io.File(dir, "m.xlsx"), Seq(
      Seq(s("company_name")), Seq(s("Acme"))))
    val e = the[Exception] thrownBy
      Xlsx.read(spark, dir.getAbsolutePath, schema).collect()
    e.getMessage should include("website")
  }

  test("parallelism is across files: a directory of workbooks unions") {
    val dir = Files.createTempDirectory("xlsx-many").toFile
    (0 until 3).foreach { i =>
      writeXlsx(new java.io.File(dir, s"part$i.xlsx"), Seq(
        Seq(s("company_name"), s("employees")),
        Seq(s(s"co-$i-a"), Some(("n", s"${i * 10 + 1}"))),
        Seq(s(s"co-$i-b"), Some(("n", s"${i * 10 + 2}")))))
    }
    val two = StructType(Seq(
      StructField("company_name", StringType), StructField("employees", LongType)))
    val out = Xlsx.read(spark, dir.getAbsolutePath, two)
    out.count() shouldEqual 6
    out.rdd.getNumPartitions should be >= 1
    out.orderBy("employees").collect().map(_.getLong(1)).toSeq shouldEqual
      Seq(1L, 2L, 11L, 12L, 21L, 22L)
  }

  test("a header-only workbook yields an empty frame, not a crash") {
    val dir = Files.createTempDirectory("xlsx-empty").toFile
    writeXlsx(new java.io.File(dir, "e.xlsx"), Seq(header))
    Xlsx.read(spark, dir.getAbsolutePath, schema).count() shouldEqual 0L
  }

  test("first sheet = lowest sheet NUMBER, not zip archive order") {
    // writers may store worksheet parts in any order; a reader keyed on
    // archive order would silently read sheet10 here
    val dir = Files.createTempDirectory("xlsx-multi").toFile
    def sheetXml(name: String) =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
         |<row r="1"><c r="A1" t="inlineStr"><is><t>company_name</t></is></c></row>
         |<row r="2"><c r="A2" t="inlineStr"><is><t>$name</t></is></c></row>
         |</sheetData></worksheet>""".stripMargin
    val zout = new ZipOutputStream(new FileOutputStream(new java.io.File(dir, "multi.xlsx")))
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name)); zout.write(content.getBytes("UTF-8")); zout.closeEntry()
    }
    put("xl/worksheets/sheet10.xml", sheetXml("from-sheet-10"))
    put("xl/worksheets/sheet2.xml", sheetXml("from-sheet-2"))
    put("xl/worksheets/sheet1.xml", sheetXml("from-sheet-1"))
    zout.close()
    val one = StructType(Seq(StructField("company_name", StringType)))
    Xlsx.read(spark, dir.getAbsolutePath, one).collect()
      .map(_.getString(0)).toSeq shouldEqual Seq("from-sheet-1")
  }

  test("rich-text INLINE strings concatenate runs; phonetic runs are skipped") {
    val dir = Files.createTempDirectory("xlsx-irich").toFile
    val sheetXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>company_name</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is>
        |  <r><t xml:space="preserve">Initech </t></r><r><t>Industrial</t></r>
        |  <rPh sb="0" eb="7"><t>ィニテック</t></rPh>
        |</is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val zout = new ZipOutputStream(new FileOutputStream(new java.io.File(dir, "ir.xlsx")))
    zout.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zout.write(sheetXml.getBytes("UTF-8")); zout.closeEntry(); zout.close()
    val one = StructType(Seq(StructField("company_name", StringType)))
    Xlsx.read(spark, dir.getAbsolutePath, one).collect()
      .head.getString(0) shouldEqual "Initech Industrial"
  }

  test("DateType/TimestampType decode serial and ISO date cells") {
    val dir = Files.createTempDirectory("xlsx-dates").toFile
    val sheetXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>founded</t></is></c><c r="B1" t="inlineStr"><is><t>last_seen</t></is></c><c r="C1" t="inlineStr"><is><t>iso_day</t></is></c></row>
        |<row r="2"><c r="A2"><v>45292</v></c><c r="B2"><v>45292.5</v></c><c r="C2" t="d"><v>2024-03-05</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val zout = new ZipOutputStream(new FileOutputStream(new java.io.File(dir, "d.xlsx")))
    zout.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zout.write(sheetXml.getBytes("UTF-8")); zout.closeEntry(); zout.close()
    val sch = StructType(Seq(
      StructField("founded", DateType),
      StructField("last_seen", TimestampType),
      StructField("iso_day", DateType)))
    val row = Xlsx.read(spark, dir.getAbsolutePath, sch).collect().head
    // Excel serial 45292 = 2024-01-01 (epoch 1899-12-30); .5 = noon
    row.getAs[java.sql.Date]("founded").toString shouldEqual "2024-01-01"
    row.getAs[java.sql.Timestamp]("last_seen").toString shouldEqual "2024-01-01 12:00:00.0"
    row.getAs[java.sql.Date]("iso_day").toString shouldEqual "2024-03-05"
  }

  test("a workbook carrying a DTD (XXE shape) is rejected, not resolved") {
    // workbooks are untrusted input; the StAX reader runs with DTD
    // support off, so a DOCTYPE with an external entity must fail fast
    // instead of ever being fetched/expanded
    val dir = Files.createTempDirectory("xlsx-xxe").toFile
    val sheetXml =
      """<?xml version="1.0"?>
        |<!DOCTYPE worksheet [<!ENTITY xxe SYSTEM "file:///etc/hostname">]>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>&xxe;</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val zout = new ZipOutputStream(new FileOutputStream(new java.io.File(dir, "evil.xlsx")))
    zout.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zout.write(sheetXml.getBytes("UTF-8"))
    zout.closeEntry(); zout.close()
    val one = StructType(Seq(StructField("company_name", StringType)))
    val e = the[Exception] thrownBy Xlsx.read(spark, dir.getAbsolutePath, one).collect()
    e.getMessage should include("malformed xlsx")
  }

  test("column-ref arithmetic: A, Z, AA, BC") {
    Xlsx.colIndex("A1") shouldEqual 0
    Xlsx.colIndex("Z9") shouldEqual 25
    Xlsx.colIndex("AA12") shouldEqual 26
    Xlsx.colIndex("BC7") shouldEqual 54
  }

  test("a reordered workbook reads the FIRST TAB via workbook.xml + rels, not part names") {
    // the user dragged their data sheet (stored as sheet3.xml) to the
    // first tab position: part names never change on reorder, only
    // workbook.xml's <sheet> order — lowest-numbered-part logic would
    // silently read sheet1.xml here
    val dir = Files.createTempDirectory("xlsx-reorder").toFile
    def sheetXml(name: String) =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
         |<row r="1"><c r="A1" t="inlineStr"><is><t>company_name</t></is></c></row>
         |<row r="2"><c r="A2" t="inlineStr"><is><t>$name</t></is></c></row>
         |</sheetData></worksheet>""".stripMargin
    val workbookXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Data" sheetId="3" r:id="rId2"/><sheet name="Old" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val relsXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet3.xml"/>
        |</Relationships>""".stripMargin
    val zout = new ZipOutputStream(new FileOutputStream(new java.io.File(dir, "re.xlsx")))
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name)); zout.write(content.getBytes("UTF-8")); zout.closeEntry()
    }
    put("xl/workbook.xml", workbookXml)
    put("xl/_rels/workbook.xml.rels", relsXml)
    put("xl/worksheets/sheet1.xml", sheetXml("old-first-part"))
    put("xl/worksheets/sheet3.xml", sheetXml("first-tab-data"))
    zout.close()
    val one = StructType(Seq(StructField("company_name", StringType)))
    Xlsx.read(spark, dir.getAbsolutePath, one).collect()
      .map(_.getString(0)).toSeq shouldEqual Seq("first-tab-data")
  }

  test("shared-string phonetic runs (furigana) are annotations, not content") {
    val dir = Files.createTempDirectory("xlsx-furi").toFile
    val ssXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">
        |<si><t>company_name</t></si>
        |<si><t>Tokyo</t><rPh sb="0" eb="2"><t>TOKYO-READING</t></rPh></si>
        |</sst>""".stripMargin
    val sheetXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val zout = new ZipOutputStream(new FileOutputStream(new java.io.File(dir, "f.xlsx")))
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name)); zout.write(content.getBytes("UTF-8")); zout.closeEntry()
    }
    put("xl/sharedStrings.xml", ssXml)
    put("xl/worksheets/sheet1.xml", sheetXml)
    zout.close()
    val one = StructType(Seq(StructField("company_name", StringType)))
    Xlsx.read(spark, dir.getAbsolutePath, one).collect()
      .map(_.getString(0)).toSeq shouldEqual Seq("Tokyo")
  }

  test("a bad cell value names the data row instead of an anonymous cast failure") {
    val dir = Files.createTempDirectory("xlsx-bad").toFile
    writeXlsx(new java.io.File(dir, "b.xlsx"), Seq(
      header,
      Seq(s("acme"), s("w"), Some(("str", "not-a-number")), Some(("n", "1.5")), Some(("b", "1")))))
    val e = intercept[org.apache.spark.SparkException] {
      Xlsx.read(spark, dir.getAbsolutePath, schema).collect()
    }
    e.getMessage should include("data row 1")
  }

  test("column pruning: a 2-column projection of a 50-column sheet materializes only those cells") {
    val dir = Files.createTempDirectory("xlsx-prune").toFile
    val f = new java.io.File(dir, "wide.xlsx")
    val nCols = 50
    val nRows = 20
    val hdr = (0 until nCols).map(i => s(s"col$i"))
    val data = (0 until nRows).map(r =>
      (0 until nCols).map(c => Some(("n", (r.toLong * nCols + c).toString)): Option[(String, String)]))
    writeXlsx(f, hdr +: data)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)

    val narrow = StructType(Seq(
      StructField("col3", LongType), StructField("col47", LongType)))
    val pruned = new java.util.concurrent.atomic.AtomicLong
    val rows = Xlsx.parseWorkbook(bytes, narrow, pruned).toVector
    rows.length shouldEqual nRows
    rows.head.getAs[Long](0) shouldEqual 3L
    rows.head.getAs[Long](1) shouldEqual 47L
    rows.last.getAs[Long](0) shouldEqual (nRows - 1).toLong * nCols + 3
    // the proof: header cells + exactly 2 cells per data row — the other
    // 48 columns of every data row were never materialized
    pruned.get() shouldEqual nCols.toLong + nRows.toLong * 2

    // contrast: the full-width read touches every cell
    val full = StructType((0 until nCols).map(i => StructField(s"col$i", LongType)))
    val allCells = new java.util.concurrent.atomic.AtomicLong
    Xlsx.parseWorkbook(bytes, full, allCells).toVector.length shouldEqual nRows
    allCells.get() shouldEqual nCols.toLong * (nRows + 1)

    // and the distributed read path honors the same projection
    val viaRead = Xlsx.read(spark, dir.getAbsolutePath, narrow)
      .orderBy("col3").collect()
    viaRead.length shouldEqual nRows
    viaRead.head.getAs[Long]("col47") shouldEqual 47L
  }

  test("pruning keeps a data row whose projected cells are all blank (all-null row, not dropped)") {
    val dir = Files.createTempDirectory("xlsx-prune-blank").toFile
    val f = new java.io.File(dir, "sparse.xlsx")
    // row 1 fills only col1 (unprojected); row 2 fills col0 too
    writeXlsx(f, Seq(
      Seq(s("a"), s("b")),
      Seq(None, Some(("n", "7"))),
      Seq(Some(("n", "1")), Some(("n", "8")))))
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val onlyA = StructType(Seq(StructField("a", LongType)))
    val rows = Xlsx.parseWorkbook(bytes, onlyA).toVector
    rows.length shouldEqual 2
    rows.head.isNullAt(0) shouldEqual true
    rows.last.getAs[Long](0) shouldEqual 1L
  }
}
