package graft.sources

import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Excel XLSX read/write with zero external dependencies (reference
  * src/io/excel.rs, 1,320 LoC): XLSX is a zip of XML parts, both of
  * which the JDK provides (java.util.zip + javax.xml DOM).
  *
  * Deliberately driver-side and single-file: a spreadsheet is a
  * small-data interchange format (the container caps at 2^20 rows),
  * exactly like the reference's single-node implementation. Large
  * data belongs in parquet. Writing collects the DataFrame (guarded);
  * reading parses one file and parallelizes the rows.
  *
  * Writer emits inline strings (no sharedStrings part); reader
  * understands both inline and shared strings, sparse cells via `r`
  * references, and numeric/string/boolean cell types.
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
      sheetName: String = "Sheet1"): Unit = {
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

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
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
      s"""<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
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
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally zos.close()
  }

  /** Read the first worksheet of an XLSX file; row 1 is the header.
    * Columns whose every non-empty cell parses as a number become
    * DoubleType, otherwise StringType. */
  def readXlsx(spark: SparkSession, path: String): DataFrame = {
    // pull the parts we need out of the zip
    var sheetXml: Array[Byte] = null
    var sharedXml: Array[Byte] = null
    val zis = new ZipInputStream(new FileInputStream(path))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name.matches("xl/worksheets/sheet1\\.xml") ||
            (sheetXml == null && name.matches("xl/worksheets/sheet\\d+\\.xml"))) {
          sheetXml = readAll(zis)
        } else if (name == "xl/sharedStrings.xml") {
          sharedXml = readAll(zis)
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    require(sheetXml != null, s"no worksheet found in $path")

    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    def parse(bytes: Array[Byte]) =
      dbf.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes))

    val shared: IndexedSeq[String] =
      if (sharedXml == null) IndexedSeq.empty
      else {
        val doc = parse(sharedXml)
        val sis = doc.getElementsByTagName("si")
        (0 until sis.getLength).map(i => sis.item(i).getTextContent)
      }

    val doc = parse(sheetXml)
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
