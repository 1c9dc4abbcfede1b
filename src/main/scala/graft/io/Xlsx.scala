package graft.io

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable

/** Minimal Office Open XML spreadsheet (.xlsx) reader/writer on the
  * bare JDK (zip + StAX) — no external dependency, which is the point:
  * real ixmp users exchange .xlsx scenario files (reference
  * ixmp/backend/io.py:55-362), and this container ships no spreadsheet
  * library.
  *
  * Scope matches the ixmp data model (SURVEY §1.4): cells are strings
  * (all dimension keys), numbers (value/lvl/mrg, years) or booleans —
  * no dates, styles, formulas, merged cells. Strings are written
  * inline (`t="inlineStr"`), so no sharedStrings table is needed; the
  * READER still understands `t="s"` shared strings, `t="str"`, and
  * `t="b"`, so files written by Excel/pandas load too.
  *
  * All driver-side by design: the reference collects every item into
  * pandas before writing (`to_excel`, scenario.py:1078-1117) — item
  * frames are small; bulk facts belong in parquet. The writer streams
  * row iterators, so memory stays O(row) even at the 1,048,576-row
  * sheet cap.
  */
object Xlsx {

  /** Rows per sheet cap (reference EXCEL_MAX_ROWS, io.py:22) including
    * the header row, after which writers split into `name(2)`, … */
  val MaxRows: Int = 1048576

  // ---- writing -------------------------------------------------------

  /** Write `sheets` as (name, rows) in order; each row is a sequence of
    * String / Double / Long / Int / Boolean / null cells. The FIRST row
    * of each sheet is the header. */
  def write(path: String, sheets: Seq[(String, Iterator[Seq[Any]])]): Unit = {
    // OOXML sheet-name rules (review r9): Excel refuses workbooks with
    // over-31-char or punctuated names even though our own reader
    // accepts them — fail at write time like openpyxl does, or the
    // file round-trips in tests yet defeats its interchange purpose
    val bad = "[:\\\\/?*\\[\\]]".r
    sheets.map(_._1).foreach { n =>
      require(n.nonEmpty && n.length <= 31,
        s"sheet name '$n' exceeds Excel's 31-character limit")
      require(bad.findFirstIn(n).isEmpty,
        s"sheet name '$n' contains a character Excel forbids (: \\ / ? * [ ])")
    }
    require(sheets.map(_._1).distinct.size == sheets.size,
      "duplicate sheet names")
    val zip = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      val names = sheets.map(_._1)
      putEntry(zip, "[Content_Types].xml", contentTypes(names.size))
      putEntry(zip, "_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      putEntry(zip, "xl/workbook.xml", workbookXml(names))
      putEntry(zip, "xl/_rels/workbook.xml.rels", workbookRels(names.size))
      sheets.zipWithIndex.foreach { case ((_, rows), i) =>
        zip.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${i + 1}.xml"))
        val w = new OutputStreamWriter(zip, StandardCharsets.UTF_8)
        w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
        w.write("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
        var r = 0
        rows.foreach { cells =>
          r += 1
          require(r <= MaxRows, s"sheet exceeds $MaxRows rows — split it first")
          w.write(s"""<row r="$r">""")
          cells.zipWithIndex.foreach { case (v, c) => writeCell(w, r, c, v) }
          w.write("</row>")
        }
        w.write("</sheetData></worksheet>")
        w.flush()
        zip.closeEntry()
      }
    } finally zip.close()
  }

  private def writeCell(w: OutputStreamWriter, row: Int, colIdx: Int, v: Any): Unit = {
    val ref = s"${colLetters(colIdx)}$row"
    v match {
      case null | None => // omitted cell = empty
      case b: Boolean => w.write(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
      // NaN/Infinity are not legal numeric <v> content (Excel flags
      // the part as corrupt); write them as inline strings
      case d: Double if d.isNaN || d.isInfinite =>
        w.write(s"""<c r="$ref" t="inlineStr"><is><t>$d</t></is></c>""")
      case f: Float if f.isNaN || f.isInfinite =>
        w.write(s"""<c r="$ref" t="inlineStr"><is><t>$f</t></is></c>""")
      case n @ (_: Double | _: Float | _: Long | _: Int | _: Short | _: Byte) =>
        w.write(s"""<c r="$ref"><v>$n</v></c>""")
      case s =>
        w.write(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${escape(s.toString)}</t></is></c>""")
    }
  }

  private def putEntry(zip: ZipOutputStream, name: String, content: String): Unit = {
    zip.putNextEntry(new ZipEntry(name))
    zip.write(content.getBytes(StandardCharsets.UTF_8))
    zip.closeEntry()
  }

  private def contentTypes(n: Int): String = {
    val overrides = (1 to n).map(i =>
      s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
       |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
       |<Default Extension="xml" ContentType="application/xml"/>
       |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
       |${overrides.mkString("\n")}
       |</Types>""".stripMargin
  }

  private def workbookXml(names: Seq[String]): String = {
    val sheets = names.zipWithIndex.map { case (n, i) =>
      s"""<sheet name="${escape(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
       |<sheets>${sheets.mkString}</sheets>
       |</workbook>""".stripMargin
  }

  private def workbookRels(n: Int): String = {
    val rels = (1 to n).map(i =>
      s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
       |${rels.mkString("\n")}
       |</Relationships>""".stripMargin
  }

  private[graft] def colLetters(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      // XML 1.0 forbids most C0 controls even escaped — emitting one
      // verbatim (common in noisy scraped corpora routed through
      // write_report) produces a workbook neither Excel nor this
      // package's own StAX reader can parse; drop them
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ()
      case c => sb.append(c)
    }
    sb.toString
  }

  // ---- reading -------------------------------------------------------

  /** Read all sheets in workbook order as (name, rows of string cells).
    * Numeric cells keep their literal text (`4.0` stays "4.0"); missing
    * cells inside a row become "". */
  /** Sheet rows → untyped (all-string) DataFrame under `header`'s
    * schema — the ONE conversion shared by the scenario reader, the TS
    * reader, and Reporter.addFile (review r9: the block was
    * triplicated, and split-sheet continuation rows shorter than the
    * header sheet's width crashed createDataFrame; rows now pad/trim
    * to the header width). */
  def rowsToDf(spark: org.apache.spark.sql.SparkSession,
      header: Seq[String], rows: Seq[Seq[String]]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val width = header.length
    val schema = StructType(header.map(c => StructField(c, StringType)))
    val fitted = rows.zipWithIndex.map { case (r, i) =>
      // Over-wide rows must not lose data silently (review r10):
      // trailing EMPTY cells beyond the header width are writer noise
      // (some producers emit them) and are dropped; a NON-empty cell
      // past the header is malformed input and fails loudly.
      if (r.length > width) {
        val extra = r.drop(width).filter(_.nonEmpty)
        // The ordinal is the DATA-row index (header excluded): callers
        // concatenate split-sheet continuations, so a single
        // Excel-visible row number does not exist here (ADVICE r10 —
        // 'row N' read as the sheet row, which is off by the header).
        require(extra.isEmpty,
          s"data row ${i + 1} (excluding the header row) has ${r.length} " +
            s"cells but the header has $width; " +
            s"non-empty overflow cells: ${extra.take(3).mkString("[", ", ", "]")}")
      }
      val f = if (r.length > width) r.take(width)
        else if (r.length < width) r ++ Seq.fill(width - r.length)("")
        else r
      org.apache.spark.sql.Row(f: _*)
    }
    spark.createDataFrame(java.util.Arrays.asList(fitted: _*), schema)
  }

  /** Reassemble a `base`, `base(2)`, … split-sheet family in order
    * (the split-at-[[MaxRows]] write convention) into (header,
    * dataRows). ONE copy of the stitch (review r12: Reporter.addFile
    * and ScenarioIO's item reader each hand-rolled the pattern —
    * quote + "(\\d+)" match, base-first sort, per-sheet header drop —
    * and had already drifted subtly). */
  def stitchSheets(all: Seq[(String, Seq[Seq[String]])],
      base: String): (Seq[String], Seq[Seq[String]]) = {
    val byName = all.toMap
    val partPattern = java.util.regex.Pattern.quote(base) + "\\(\\d+\\)"
    val parts = all.map(_._1)
      .filter(k => k == base || k.matches(partPattern))
      // base maps BELOW any numbered part: the writer convention
      // starts continuations at (2), but a literal 'base(1)' sheet
      // must still sort strictly after the base rather than tying
      // with it and riding input order (ADVICE r12)
      .sortBy(k => if (k == base) Int.MinValue
        else k.stripPrefix(base + "(").stripSuffix(")").toInt)
    require(parts.nonEmpty, s"no sheet '$base' in the workbook")
    val header = byName(parts.head).headOption.getOrElse(
      throw new IllegalArgumentException(s"sheet '$base' has no header row"))
    (header, parts.flatMap(p => byName(p).drop(1)))
  }

  def read(path: String): Seq[(String, Seq[Seq[String]])] = {
    val zf = new ZipFile(path)
    try {
      val shared = Option(zf.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zf, e)).getOrElse(IndexedSeq.empty)
      val rels = parseRels(zf)
      parseWorkbook(zf).map { case (name, rId) =>
        val target0 = rels.getOrElse(rId,
          throw new IllegalArgumentException(s"no relationship '$rId' for sheet '$name'"))
        val target = if (target0.startsWith("/")) target0.drop(1) else s"xl/$target0"
        val entry = Option(zf.getEntry(target)).getOrElse(
          throw new IllegalArgumentException(s"missing worksheet part '$target'"))
        name -> parseSheet(zf, entry, shared)
      }
    } finally zf.close()
  }

  private def reader(zf: ZipFile, e: ZipEntry): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_NAMESPACE_AWARE, true)
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(zf.getInputStream(e))
  }

  private def parseSharedStrings(zf: ZipFile, e: ZipEntry): IndexedSeq[String] = {
    val r = reader(zf, e)
    val out = mutable.ArrayBuffer.empty[String]
    var cur: StringBuilder = null
    var inT = false
    // Excel files carrying East Asian phonetic guides nest <rPh><t>…
    // inside <si>; that text is an annotation of the value, not part of
    // it — appending it would corrupt every annotated dimension key
    var phonetic = 0
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "rPh" | "phoneticPr" => phonetic += 1
            case "t" => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS
            if inT && phonetic == 0 && cur != null =>
          cur.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "rPh" | "phoneticPr" => phonetic -= 1
            case "si" => out += cur.toString; cur = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.toIndexedSeq
  }

  private def parseWorkbook(zf: ZipFile): Seq[(String, String)] = {
    val e = Option(zf.getEntry("xl/workbook.xml")).getOrElse(
      throw new IllegalArgumentException(s"not an xlsx: no xl/workbook.xml"))
    val r = reader(zf, e)
    val out = mutable.ArrayBuffer.empty[(String, String)]
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
        r.getLocalName == "sheet") {
        var name: String = null
        var rId: String = null
        (0 until r.getAttributeCount).foreach { i =>
          r.getAttributeLocalName(i) match {
            case "name" => name = r.getAttributeValue(i)
            case "id" => rId = r.getAttributeValue(i)
            case _ =>
          }
        }
        out += ((name, rId))
      }
    }
    r.close()
    out.toSeq
  }

  private def parseRels(zf: ZipFile): Map[String, String] = {
    Option(zf.getEntry("xl/_rels/workbook.xml.rels")).map { e =>
      val r = reader(zf, e)
      val out = mutable.Map.empty[String, String]
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
          var id: String = null
          var target: String = null
          (0 until r.getAttributeCount).foreach { i =>
            r.getAttributeLocalName(i) match {
              case "Id" => id = r.getAttributeValue(i)
              case "Target" => target = r.getAttributeValue(i)
              case _ =>
            }
          }
          out(id) = target
        }
      }
      r.close()
      out.toMap
    }.getOrElse(Map.empty)
  }

  private def parseSheet(zf: ZipFile, e: ZipEntry,
      shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val r = reader(zf, e)
    val rows = mutable.ArrayBuffer.empty[Seq[String]]
    var row: mutable.ArrayBuffer[String] = null
    var cellType = ""
    var cellCol = -1
    var inV = false
    var inT = false
    var text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer.empty[String]
            case "c" =>
              cellType = ""
              cellCol = -1
              (0 until r.getAttributeCount).foreach { i =>
                r.getAttributeLocalName(i) match {
                  case "t" => cellType = r.getAttributeValue(i)
                  case "r" => cellCol = colIndex(r.getAttributeValue(i))
                  case _ =>
                }
              }
              if (cellCol < 0) cellCol = row.size
              text = new StringBuilder
            case "v" => inV = true
            case "t" => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV || inT =>
          text.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inT = false
            case "c" =>
              val value = cellType match {
                case "s" =>
                  // name the cell on a corrupt shared-string reference
                  // (review r13): a bare NumberFormatException /
                  // IndexOutOfBounds from a third-party writer's file
                  // gives the user nothing to locate the damage with
                  val idx = text.toString.trim
                  val i = try idx.toInt catch { case _: NumberFormatException =>
                    throw new IllegalArgumentException(
                      s"corrupt xlsx: cell ${colLetters(cellCol)} has " +
                        s"non-numeric shared-string index '$idx'")
                  }
                  if (i < 0 || i >= shared.length)
                    throw new IllegalArgumentException(
                      s"corrupt xlsx: cell ${colLetters(cellCol)} references " +
                        s"shared string $i of ${shared.length}")
                  shared(i)
                case "b" => if (text.toString.trim == "1") "true" else "false"
                case _ => text.toString // n, str, inlineStr
              }
              // place the value AT its r-attribute column (review r9:
              // append-after-pad silently shifted out-of-order or
              // duplicate cell refs from third-party writers into the
              // wrong columns)
              while (row.size <= cellCol) row += "" // skipped empty cells
              row(cellCol) = value
            case "row" =>
              // drop entirely-empty rows: Excel represents a blank row
              // either as an omitted <row> (which this reader compacts
              // implicitly — the r attribute is not used for vertical
              // placement) or as a present-but-cell-less/styled-only
              // <row/>; the second form previously became an all-""
              // data row that item loaders would ingest as garbage
              // empty-string keys. Both forms now read identically.
              if (row.exists(_.nonEmpty)) rows += row.toSeq
              row = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    // right-pad short rows to the sheet's width
    val width = if (rows.isEmpty) 0 else rows.map(_.size).max
    rows.map(rw => rw ++ Seq.fill(width - rw.size)("")).toSeq
  }

  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var n = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      n = n * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    n - 1
  }
}
