package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal self-contained XLSX support (S2 — `pd.read_excel`
  * equivalent, reference data_analysis.py:18). No offline Spark
  * connector exists in this build, and xlsx is just a zip of
  * well-documented OOXML parts, so this reads them directly:
  * `xl/sharedStrings.xml` + the first worksheet.
  *
  * Scale note: xlsx is an inherently single-stream format (the
  * reference's own ceiling too) — the reader parses one file on the
  * driver and hands Spark an in-memory DataFrame. The 100 TB path is
  * convert-once-to-parquet; this exists so a reference user's upload
  * flow works unchanged.
  *
  * Supported: header row, shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), numeric cells, blank cells → null, sparse rows
  * via `r="B3"`-style cell references. Type inference mirrors CSV:
  * all-long → LongType, all-numeric → DoubleType, else StringType.
  */
object Xlsx {

  private def colIndex(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** Inverse of [[colIndex]]: bijective base-26 (0→A, 25→Z, 26→AA). */
  private def colName(idx: Int): String = {
    val sb = new StringBuilder
    var n = idx + 1
    while (n > 0) {
      sb.insert(0, ('A' + (n - 1) % 26).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val zip = new ZipFile(path)
    def load(name: String): Option[scala.xml.Elem] =
      Option(zip.getEntry(name)).map { e =>
        val in = zip.getInputStream(e)
        try scala.xml.XML.load(in) finally in.close()
      }
    try {
      val shared: IndexedSeq[String] =
        load("xl/sharedStrings.xml").toIndexedSeq
          .flatMap(ss => (ss \ "si").map(si => (si \\ "t").map(_.text).mkString))
      val sheet = load("xl/worksheets/sheet1.xml")
        .getOrElse(throw new IllegalArgumentException(
          s"$path: xl/worksheets/sheet1.xml not found"))

      val rawRows: Seq[Map[Int, String]] = (sheet \\ "row").map { r =>
        (r \ "c").flatMap { c =>
          val ref = (c \ "@r").text
          val idx = if (ref.nonEmpty) colIndex(ref) else -1
          val t = (c \ "@t").text
          val value = t match {
            case "s" =>
              (c \ "v").headOption.map(v => shared(v.text.trim.toInt))
            case "inlineStr" => Some((c \\ "t").map(_.text).mkString)
            case _ => (c \ "v").headOption.map(_.text)
          }
          value.filter(_.nonEmpty).map(v => idx -> v)
        }.toMap
      }
      require(rawRows.nonEmpty, s"$path: empty sheet")

      val header = rawRows.head
      val nCols = (rawRows.map(m => if (m.isEmpty) -1 else m.keys.max).max) + 1
      val names = (0 until nCols).map(i => header.getOrElse(i, s"_c$i"))
      val body = rawRows.tail

      def parsesAs[A](s: String, f: String => A): Boolean =
        try { f(s); true } catch { case _: NumberFormatException => false }
      val types = (0 until nCols).map { i =>
        val vals = body.flatMap(_.get(i))
        if (vals.nonEmpty && vals.forall(parsesAs(_, _.toLong))) LongType
        else if (vals.nonEmpty && vals.forall(parsesAs(_, _.toDouble))) DoubleType
        else StringType
      }
      val schema = StructType(names.zip(types).map { case (n, t) =>
        StructField(n, t, nullable = true)
      })
      val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
      body.foreach { m =>
        rows.add(Row.fromSeq((0 until nCols).map { i =>
          m.get(i) match {
            case None => null
            case Some(v) => types(i) match {
              case LongType => v.toLong
              case DoubleType => v.toDouble
              case _ => v
            }
          }
        }))
      }
      spark.createDataFrame(rows, schema)
    } finally zip.close()
  }

  /** Minimal writer (test fixture + export path): all strings inline,
    * numbers plain — readable by this reader, Excel, and pandas. */
  def write(rows: Seq[Seq[Any]], path: String): Unit = {
    def cellXml(rowIdx: Int, colIdx: Int, v: Any): String = {
      val ref = s"${colName(colIdx)}${rowIdx + 1}"
      v match {
        case null => ""
        case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
        case s =>
          val esc = s.toString.replace("&", "&amp;").replace("<", "&lt;")
          s"""<c r="$ref" t="inlineStr"><is><t>$esc</t></is></c>"""
      }
    }
    val sheetXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        rows.zipWithIndex.map { case (r, i) =>
          s"""<row r="${i + 1}">""" +
            r.zipWithIndex.map { case (v, j) => cellXml(i, j, v) }.mkString +
            "</row>"
        }.mkString + "</sheetData></worksheet>"
    val workbookXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>"""

    val out = new ZipOutputStream(new BufferedOutputStream(
      new FileOutputStream(path)))
    try {
      Seq(
        "[Content_Types].xml" -> contentTypes,
        "_rels/.rels" -> rootRels,
        "xl/workbook.xml" -> workbookXml,
        "xl/_rels/workbook.xml.rels" -> workbookRels,
        "xl/worksheets/sheet1.xml" -> sheetXml).foreach { case (name, content) =>
        out.putNextEntry(new ZipEntry(name))
        out.write(content.getBytes("UTF-8"))
        out.closeEntry()
      }
    } finally out.close()
  }
}
