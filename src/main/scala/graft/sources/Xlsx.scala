package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

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

  /** Parsed single-file payload: header names, per-column inferred
    * types, body rows as raw strings padded to the header width
    * (nulls for blanks). Pure function of the bytes — safe to run
    * INSIDE an executor task (the multi-file path does). */
  private[sources] final case class Parsed(
      names: Seq[String], types: Seq[DataType], body: Seq[Seq[String]])

  /** Parse one workbook from raw bytes (sequential ZipInputStream —
    * no local-file assumption, so the bytes can come from any
    * filesystem Spark read them from). Entry order in the zip is
    * arbitrary; the two needed parts are buffered in one pass. */
  private[sources] def parseBytes(bytes: Array[Byte], label: String): Parsed = {
    val wanted = Set("xl/sharedStrings.xml", "xl/worksheets/sheet1.xml")
    val parts = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null && parts.size < wanted.size) {
        if (wanted(e.getName)) parts(e.getName) = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    def load(name: String): Option[scala.xml.Elem] =
      parts.get(name).map(b =>
        scala.xml.XML.load(new java.io.ByteArrayInputStream(b)))
    val shared: IndexedSeq[String] =
      load("xl/sharedStrings.xml").toIndexedSeq
        .flatMap(ss => (ss \ "si").map(si => (si \\ "t").map(_.text).mkString))
    val sheet = load("xl/worksheets/sheet1.xml")
      .getOrElse(throw new IllegalArgumentException(
        s"$label: xl/worksheets/sheet1.xml not found"))

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
    require(rawRows.nonEmpty, s"$label: empty sheet")

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
    Parsed(names, types,
      body.map(m => (0 until nCols).map(i => m.get(i).orNull)))
  }

  private def convert(v: String, t: DataType): Any = v match {
    case null => null
    case s => t match {
      case LongType => s.toLong
      case DoubleType => s.toDouble
      case _ => s
    }
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val p = parseBytes(bytes, path)
    val schema = StructType(p.names.zip(p.types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    p.body.foreach(vals =>
      rows.add(Row.fromSeq(vals.zip(p.types).map { case (v, t) => convert(v, t) })))
    spark.createDataFrame(rows, schema)
  }

  /** Parallel multi-file ingest — closes the S2 "per-file
    * single-stream" gap the distributed way: the single-FILE stream
    * is format-inherent (a workbook is one zip with a central
    * directory), but a DIRECTORY of workbooks parallelizes across
    * files. `binaryFile` ships each file's bytes to executor tasks
    * (small files pack per `filesOpenCostInBytes`, big ones get their
    * own task); [[parseBytes]] runs there, never on the driver.
    *
    * Two passes over the (small, upload-sized) files: a schema pass
    * collecting only per-file headers/types, then a row pass under
    * the merged schema. Files must agree on header names; column
    * TYPES widen Long → Double → String (one file's ids read 1/2/3,
    * another's 1.5 — the union is double, pandas' own promotion).
    * `path` may be a directory (filtered to *.xlsx) or a glob. */
  def readAll(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(path)
      .select("path", "content")
    import spark.implicits._
    val metas = bin.as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val parsed = parseBytes(bytes, p)
        // a column with no values in THIS file infers StringType but
        // must not veto another file's numeric evidence — mark it
        // "empty" so widening treats it as bottom, not top
        val marked = parsed.types.zipWithIndex.map { case (t, i) =>
          if (parsed.body.forall(_(i) == null)) "empty" else t.typeName
        }
        (p, parsed.names, marked)
      }
      .collect().sortBy(_._1)
    require(metas.nonEmpty, s"$path: no .xlsx files matched")
    val names = metas.head._2
    metas.foreach { case (p, n, _) =>
      require(n == names,
        s"$p: header $n differs from ${metas.head._1}: $names")
    }
    def rank(t: String): Int = t match {
      case "empty" => -1 // no evidence — defer to files that have values
      case "long" => 0
      case "double" => 1
      case _ => 2
    }
    val widened: Seq[DataType] = metas.toSeq.map(_._3).transpose
      .map(ts => ts.maxBy(rank) match {
        case "long" => LongType
        case "double" => DoubleType
        case _ => StringType // incl. all-files-empty: match single-file inference
      })
    val schema = StructType(names.zip(widened).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    val rowsRdd = bin.as[(String, Array[Byte])].rdd.flatMap {
      case (p, bytes) =>
        parseBytes(bytes, p).body.map(vals =>
          Row.fromSeq(vals.zip(widened).map { case (v, t) => convert(v, t) }))
    }
    spark.createDataFrame(rowsRdd, schema)
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
