package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Native `.xlsx` WRITE sink (K-1's literal output artifact,
  * app.py:303-317 / app.py:42-58): the reference's primary deliverable
  * is `output.xlsx`, rewritten after every enriched company. The engine
  * read xlsx natively (S-1, [[Xlsx]]); this is the mirror — a minimal
  * single-sheet SpreadsheetML writer over the JDK zip codec, zero
  * dependencies, producing workbooks [[Xlsx.read]] round-trips and any
  * spreadsheet app opens.
  *
  * Format choices (deliberately the subset the reader supports):
  *  - ONE worksheet, header row = schema field names (the reference
  *    writes a fixed header, app.py:42-58; readers locate columns by
  *    name, so header-first is the contract).
  *  - strings as INLINE strings (`t="inlineStr"`) — no sharedStrings
  *    part to build or dedup; `xml:space="preserve"` keeps leading/
  *    trailing whitespace through conforming XML parsers.
  *  - numbers as `<v>` decimal text, booleans as `t="b"` 0/1,
  *    dates/timestamps as ISO-8601 text (`t="str"`) — the reference's
  *    output columns are strings, and [[Xlsx.castCell]] parses ISO for
  *    DateType/TimestampType schemas on read-back.
  *  - NULL cells are simply ABSENT (the blank-gap convention the
  *    reader's `r="A1"` positioning decodes).
  *  - XML-illegal control characters (< 0x20 except tab/LF/CR) are
  *    replaced with U+FFFD — a documented fidelity boundary; OOXML's
  *    `_xHHHH_` escape convention is not implemented on either side,
  *    so the round-trip is self-consistent.
  *
  * Distribution posture: xlsx is a single-file, unsplittable format —
  * this is an EXPORT EDGE, not a data-path operator (same adjudication
  * as Verify's sink-only coalesce(1)). Rows stream through
  * `toLocalIterator` (one partition pinned at a time, never a full
  * collect), and [[MaxRows]] fails fast past the format's own row
  * ceiling; anything larger belongs in parquet (INGEST.md).
  */
object XlsxWrite {

  /** SpreadsheetML's hard sheet limit (2^20 rows incl. header). */
  val MaxRows: Long = 1048576L

  /** Write `df` (ordered upstream if order matters) as a single-sheet
    * workbook at the LOCAL path `path`.
    *
    * Atomic: the workbook is written to a temp file in the SAME
    * directory and renamed onto `path` with ATOMIC_MOVE — a concurrent
    * reader (the workbook is the user-facing deliverable, read while
    * [[graft.streaming.EventStream.xlsxMirrorSink]] rewrites it every
    * micro-batch) always sees a complete zip, and a crash mid-write
    * leaves the previous workbook intact plus a leftover `.tmp` we
    * delete on failure. */
  def write(df: DataFrame, path: String): Long = {
    val target = java.nio.file.Paths.get(path).toAbsolutePath
    val dir = target.getParent
    val tmp = java.nio.file.Files.createTempFile(dir, target.getFileName.toString, ".tmp")
    try {
      val out = new BufferedOutputStream(new FileOutputStream(tmp.toFile))
      val n = try writeRows(df.schema, df.toLocalIterator(), out)
      finally out.close()
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      n
    } catch {
      case e: Throwable =>
        java.nio.file.Files.deleteIfExists(tmp); throw e
    }
  }

  /** Stream `rows` into a workbook on `out`; returns data rows written. */
  def writeRows(schema: StructType, rows: java.util.Iterator[Row],
      out: OutputStream): Long = {
    val zip = new ZipOutputStream(out, StandardCharsets.UTF_8)
    def part(name: String, body: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(body.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)

    // worksheet streamed row-at-a-time — never buffered whole
    zip.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    def emit(s: String): Unit = zip.write(s.getBytes(StandardCharsets.UTF_8))
    emit("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    emit("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    // header row = schema field names, as inline strings
    emit(rowXml(1, schema.fields.zipWithIndex.map { case (f, i) =>
      cellXml(i, 1, f.name, StringType)
    }))
    var rowNo = 1L
    var n = 0L
    while (rows.hasNext) {
      val r = rows.next()
      rowNo += 1; n += 1
      require(rowNo <= MaxRows,
        s"xlsx sheet overflows $MaxRows rows — export this frame as parquet instead")
      val cells = schema.fields.indices.flatMap { i =>
        if (r.isNullAt(i)) None // blank-gap convention
        else Some(cellXml(i, rowNo, r.get(i), schema.fields(i).dataType))
      }
      emit(rowXml(rowNo, cells))
    }
    emit("</sheetData></worksheet>")
    zip.closeEntry()
    zip.finish()
    n
  }

  private def rowXml(rowNo: Long, cells: Seq[String]): String =
    if (cells.isEmpty) "" // cell-less rows are dropped on read; skip symmetric
    else cells.mkString(s"""<row r="$rowNo">""", "", "</row>")

  private def cellXml(col: Int, rowNo: Long, v: Any, dt: DataType): String = {
    val ref = colLetters(col) + rowNo
    dt match {
      case StringType =>
        s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${escape(v.toString)}</t></is></c>"""
      case BooleanType =>
        s"""<c r="$ref" t="b"><v>${if (v.asInstanceOf[Boolean]) "1" else "0"}</v></c>"""
      case DateType | TimestampType | TimestampNTZType =>
        // ISO text; Xlsx.toDateTime parses either branch on read-back
        s"""<c r="$ref" t="str"><v>${escape(isoText(v))}</v></c>"""
      case _: NumericType =>
        s"""<c r="$ref"><v>${numText(v)}</v></c>"""
      case other =>
        throw new IllegalArgumentException(
          s"unsupported xlsx sink type $other — stringify upstream")
    }
  }

  /** java.sql / java.time values → ISO-8601 in a form the reader's
    * LocalDateTime/LocalDate parse accepts. */
  private def isoText(v: Any): String = v match {
    case t: java.sql.Timestamp => t.toLocalDateTime.toString
    case d: java.sql.Date => d.toLocalDate.toString
    case t: java.time.LocalDateTime => t.toString
    case d: java.time.LocalDate => d.toString
    case t: java.time.Instant =>
      java.time.LocalDateTime.ofInstant(t, java.time.ZoneOffset.UTC).toString
    case other => other.toString
  }

  /** Decimal text: BigDecimal canonical form so doubles survive the
    * reader's BigDecimal/toDouble path bit-for-bit (Double.toString
    * round-trips; integral types print without a point). */
  private def numText(v: Any): String = v match {
    case d: Double => d.toString
    case f: Float => f.toString
    case bd: java.math.BigDecimal => bd.toPlainString
    case bd: BigDecimal => bd.underlying.toPlainString
    case other => other.toString // Byte/Short/Int/Long
  }

  /** 0 → "A", 26 → "AA" (inverse of [[Xlsx.colIndex]]). */
  private[sources] def colLetters(i: Int): String = {
    val sb = new StringBuilder
    var n = i + 1
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  /** Text-node escape + the documented control-char boundary. */
  private[sources] def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' =>
        sb.append('�') // XML 1.0-illegal; documented boundary
      case c => sb.append(c)
    }
    sb.toString
  }
}
