package graft.sources

import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Excel XLSX read/write with zero external dependencies (reference
  * src/io/excel.rs, 1,320 LoC, multi-sheet API with sheet_name
  * params): XLSX is a zip of XML parts, both of which the JDK
  * provides (java.util.zip + javax.xml DOM).
  *
  * Deliberately driver-side and single-file: a spreadsheet is a
  * small-data interchange format (the container caps at 2^20 rows),
  * exactly like the reference's single-node implementation. Large
  * data belongs in parquet. Writing collects the DataFrame (guarded);
  * reading parses one file and parallelizes the rows.
  *
  * Writer emits inline strings (no sharedStrings part); reader
  * understands both inline and shared strings, sparse cells via `r`
  * references, and numeric/string/boolean cell types. Multi-sheet:
  * [[writeXlsxSheets]] writes an ordered map of name → DataFrame,
  * [[readXlsxSheet]] selects by name or index, [[listSheets]]
  * enumerates names in workbook order.
  */
object Excel {

  private val MaxRows = 1048575 // xlsx sheet limit minus header

  private def colLetter(i: Int): String = {
    var n = i; val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Write `df` as a single-sheet XLSX file. */
  def writeXlsx(df: DataFrame, path: String,
      sheetName: String = "Sheet1"): Unit =
    writeXlsxSheets(Seq(sheetName -> df), path)

  /** One worksheet part: header row from the schema, then data rows
    * with sparse cells (nulls and non-finite doubles absent). */
  private def sheetXml(df: DataFrame): String = {
    val schema = df.schema
    val rows = df.collect()
    require(rows.length <= MaxRows,
      s"xlsx sheet capped at $MaxRows data rows; got ${rows.length} — " +
        "use parquet for large data")
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cellXml(ref: String, v: Any): String = v match {
      case null => ""
      case b: Boolean =>
        s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      // a NaN/Infinity toString inside a numeric <v> makes the file
      // unreadable to Excel — emit an empty (absent) cell instead
      case d: Double if !java.lang.Double.isFinite(d) => ""
      case f: Float if !java.lang.Float.isFinite(f) => ""
      case n @ (_: Int | _: Long | _: Double | _: Float | _: Short |
          _: Byte | _: java.math.BigDecimal) =>
        s"""<c r="$ref"><v>$n</v></c>"""
      case other =>
        s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">""" +
          xmlEscape(other.toString) + "</t></is></c>"
    }
    sb.append("<row r=\"1\">")
    schema.fieldNames.zipWithIndex.foreach { case (name, c) =>
      sb.append(cellXml(s"${colLetter(c)}1", name))
    }
    sb.append("</row>")
    rows.zipWithIndex.foreach { case (row, r) =>
      sb.append(s"""<row r="${r + 2}">""")
      (0 until schema.length).foreach { c =>
        if (!row.isNullAt(c))
          sb.append(cellXml(s"${colLetter(c)}${r + 2}", row.get(c)))
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  /** Write several DataFrames as one XLSX workbook, one worksheet
    * per (name, df) pair, in the given order. */
  def writeXlsxSheets(sheets: Seq[(String, DataFrame)],
      path: String): Unit = {
    require(sheets.nonEmpty, "writeXlsxSheets needs at least one sheet")
    require(sheets.map(_._1).distinct.length == sheets.length,
      s"duplicate sheet names: ${sheets.map(_._1).mkString(", ")}")
    val n = sheets.length

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      (1 to n).map(i =>
        s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        .mkString +
      """</Types>"""
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
      """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      "<sheets>" +
      sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString +
      "</sheets></workbook>"
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      (1 to n).map(i =>
        s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
        .mkString +
      """</Relationships>"""

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", wbRels)
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df))
      }
    } finally zos.close()
  }

  /** All parts of the zip we care about, keyed by entry name. */
  private def readParts(path: String): Map[String, Array[Byte]] = {
    val out = scala.collection.mutable.Map[String, Array[Byte]]()
    val zis = new ZipInputStream(new FileInputStream(path))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/workbook.xml" ||
            name == "xl/_rels/workbook.xml.rels" ||
            name == "xl/sharedStrings.xml" ||
            name.matches("xl/worksheets/sheet\\d+\\.xml"))
          out(name) = readAll(zis)
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.toMap
  }

  private def parseDoc(bytes: Array[Byte]): org.w3c.dom.Document = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(bytes))
  }

  /** (sheet name, worksheet part name) in workbook order, resolved
    * through the workbook → rels indirection (sheet order in the
    * workbook need not match sheetN numbering). Falls back to
    * sheetN.xml numeric order when the workbook part is absent. */
  private def sheetTable(parts: Map[String, Array[Byte]])
      : Seq[(String, String)] = {
    (parts.get("xl/workbook.xml"),
        parts.get("xl/_rels/workbook.xml.rels")) match {
      case (Some(wb), Some(rl)) =>
        val relNodes = parseDoc(rl).getElementsByTagName("Relationship")
        val relTarget = (0 until relNodes.getLength).map { i =>
          val el = relNodes.item(i).asInstanceOf[org.w3c.dom.Element]
          el.getAttribute("Id") ->
            ("xl/" + el.getAttribute("Target").stripPrefix("/xl/")
              .stripPrefix("xl/"))
        }.toMap
        val sheetNodes = parseDoc(wb).getElementsByTagName("sheet")
        (0 until sheetNodes.getLength).flatMap { i =>
          val el = sheetNodes.item(i).asInstanceOf[org.w3c.dom.Element]
          val rid = el.getAttribute("r:id")
          relTarget.get(rid).map(el.getAttribute("name") -> _)
        }
      case _ =>
        parts.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml"))
          .toSeq
          .sortBy(n => n.replaceAll("\\D+", "").toInt)
          .zipWithIndex
          .map { case (p, i) => (s"Sheet${i + 1}", p) }
    }
  }

  /** Sheet names of an XLSX workbook in workbook order. */
  def listSheets(path: String): Seq[String] =
    sheetTable(readParts(path)).map(_._1)

  /** Read the FIRST worksheet of an XLSX file; row 1 is the header.
    * Columns whose every non-empty cell parses as a number become
    * DoubleType, otherwise StringType. */
  def readXlsx(spark: SparkSession, path: String): DataFrame =
    readXlsxSheet(spark, path, 0)

  /** Read one worksheet by name. */
  def readXlsxSheet(spark: SparkSession, path: String,
      sheetName: String): DataFrame = {
    val parts = readParts(path)
    val table = sheetTable(parts)
    val part = table.collectFirst { case (n, p) if n == sheetName => p }
      .getOrElse(throw new IllegalArgumentException(
        s"no sheet named '$sheetName' in $path; " +
          s"sheets: ${table.map(_._1).mkString(", ")}"))
    sheetToDf(spark, parts, part, path)
  }

  /** Read one worksheet by 0-based workbook-order index. */
  def readXlsxSheet(spark: SparkSession, path: String,
      index: Int): DataFrame = {
    val parts = readParts(path)
    val table = sheetTable(parts)
    require(index >= 0 && index < table.length,
      s"sheet index $index out of range (0..${table.length - 1}) in $path")
    sheetToDf(spark, parts, table(index)._2, path)
  }

  private def sheetToDf(spark: SparkSession,
      parts: Map[String, Array[Byte]], sheetPart: String,
      path: String): DataFrame = {
    val sheetBytes = parts.getOrElse(sheetPart,
      throw new IllegalArgumentException(
        s"worksheet part $sheetPart missing in $path"))

    val shared: IndexedSeq[String] =
      parts.get("xl/sharedStrings.xml") match {
        case None => IndexedSeq.empty
        case Some(sx) =>
          val doc = parseDoc(sx)
          val sis = doc.getElementsByTagName("si")
          (0 until sis.getLength).map(i => sis.item(i).getTextContent)
      }

    val doc = parseDoc(sheetBytes)
    val rowNodes = doc.getElementsByTagName("row")
    val cellsByRow = (0 until rowNodes.getLength).map { r =>
      val rowEl = rowNodes.item(r).asInstanceOf[org.w3c.dom.Element]
      val cNodes = rowEl.getElementsByTagName("c")
      (0 until cNodes.getLength).flatMap { ci =>
        val cEl = cNodes.item(ci).asInstanceOf[org.w3c.dom.Element]
        val ref = cEl.getAttribute("r")
        val idx = if (ref.nonEmpty) colIndex(ref) else ci
        val t = cEl.getAttribute("t")
        val text = t match {
          case "inlineStr" => cEl.getTextContent
          case "s" => shared(cEl.getTextContent.trim.toInt)
          case _ =>
            val vs = cEl.getElementsByTagName("v")
            if (vs.getLength == 0) "" else vs.item(0).getTextContent
        }
        if (text.isEmpty && t.isEmpty) None else Some(idx -> (t, text))
      }.toMap
    }
    require(cellsByRow.nonEmpty, s"empty worksheet in $path")
    val header = cellsByRow.head
    val nCols = (cellsByRow.map(m => if (m.isEmpty) -1 else m.keys.max)
      .max) + 1
    val names = (0 until nCols).map(i =>
      header.get(i).map(_._2).filter(_.nonEmpty).getOrElse(s"_c$i"))
    val data = cellsByRow.tail
    def numeric(s: String): Boolean =
      s.nonEmpty && scala.util.Try(s.toDouble).isSuccess
    // t="b" cells are booleans, not numbers: an all-boolean column
    // round-trips as BooleanType; a boolean mixed into anything else
    // degrades the column to string ("true"/"false"), never to 1.0
    val isBool = (0 until nCols).map { c =>
      val vals = data.flatMap(_.get(c)).filter(_._2.nonEmpty)
      vals.nonEmpty && vals.forall(_._1 == "b")
    }
    val isNum = (0 until nCols).map { c =>
      val vals = data.flatMap(_.get(c)).filter(_._2.nonEmpty)
      vals.nonEmpty && vals.forall { case (t, v) =>
        t != "inlineStr" && t != "s" && t != "b" && numeric(v)
      }
    }
    val schema = StructType(names.zipWithIndex.map { case (n, i) =>
      StructField(n,
        if (isBool(i)) BooleanType
        else if (isNum(i)) DoubleType
        else StringType)
    })
    def boolOf(v: String): Boolean = v == "1" || v == "true"
    val rows = data.map { m =>
      Row.fromSeq((0 until nCols).map { c =>
        m.get(c) match {
          case None => null
          case Some((_, v)) if v.isEmpty => null
          case Some((t, v)) =>
            if (isBool(c)) boolOf(v)
            else if (isNum(c)) v.toDouble
            else if (t == "b") String.valueOf(boolOf(v))
            else v
        }
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)
  }

  private def readAll(in: java.io.InputStream): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }
}
