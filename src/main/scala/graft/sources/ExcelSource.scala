package graft.sources

import java.util.zip.ZipFile
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.w3c.dom.Element

/** S11 — minimal xlsx source for the review sheet
  * (readxls_relecture_files, common.py:507-531). An .xlsx is a zip of
  * XML parts; the container has no spreadsheet library, and the review
  * sheet is a dim-sized human-maintained file, so a dependency-free
  * driver-side parse is the honest scale-appropriate shape (the result
  * broadcasts into the J8 review semi-join). Handles shared strings,
  * inline strings, and raw numeric cells across every worksheet.
  *
  * Reference semantics preserved: the header row is skipped per sheet
  * and only rows whose 4th column is non-empty survive (a subject
  * "defined but not reviewed" is dropped, common.py:520-529).
  */
object ExcelSource {

  /** "BC12" → 0-based column index 54. */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, ch) =>
      a * 26 + (ch.toUpper - 'A' + 1)) - 1

  private def parseXml(bytes: Array[Byte]): Element = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // hostile xlsx must not be able to pull external entities
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(bytes))
      .getDocumentElement
  }

  /** All text under an element (rich-text shared strings split one
    * string across several <t> runs). */
  private def textOf(e: Element): String = {
    val ts = e.getElementsByTagName("t")
    if (ts.getLength == 0) e.getTextContent
    else (0 until ts.getLength).map(ts.item(_).getTextContent).mkString
  }

  /** Every sheet's rows as (0-based column → cell text), header
    * included; missing/empty cells absent from the map. */
  def readXlsxRows(path: String): Seq[Seq[Map[Int, String]]] = {
    val zip = new ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      def bytes(name: String): Option[Array[Byte]] =
        Option(zip.getEntry(name)).map { e =>
          val in = zip.getInputStream(e)
          try {
            // a review sheet part is KBs; a zip bomb is not — cap the
            // inflated size (the DicomCodec deflate cap's stance)
            val cap = 1 << 28
            val out = in.readNBytes(cap)
            if (in.read() >= 0)
              throw new java.io.IOException(
                s"xlsx part $name inflates past $cap bytes — refusing")
            out
          } finally in.close()
        }
      val shared: IndexedSeq[String] = bytes("xl/sharedStrings.xml") match {
        case None => IndexedSeq.empty
        case Some(b) =>
          val sis = parseXml(b).getElementsByTagName("si")
          (0 until sis.getLength)
            .map(i => textOf(sis.item(i).asInstanceOf[Element]))
      }
      val sheetNames = zip.entries().asScala.map(_.getName)
        .filter(n => n.startsWith("xl/worksheets/sheet") &&
          n.endsWith(".xml"))
        .toSeq.sorted
      sheetNames.map { name =>
        val rows = parseXml(bytes(name).get).getElementsByTagName("row")
        (0 until rows.getLength).map { r =>
          val cells = rows.item(r).asInstanceOf[Element]
            .getElementsByTagName("c")
          val m = Map.newBuilder[Int, String]
          // the `r` cell-reference attribute is optional in OOXML;
          // writers that omit it emit cells in sequential column order,
          // so an unreferenced cell sits one right of its predecessor
          var nextIdx = 0
          (0 until cells.getLength).foreach { ci =>
            val c = cells.item(ci).asInstanceOf[Element]
            val ref = c.getAttribute("r")
            val idx = if (ref.isEmpty) nextIdx else colIndex(ref)
            nextIdx = idx + 1
            val t = c.getAttribute("t")
            val v = t match {
              case "inlineStr" => textOf(c)
              case "s" =>
                val vs = c.getElementsByTagName("v")
                if (vs.getLength == 0) ""
                else shared.lift(vs.item(0).getTextContent.trim.toInt)
                  .getOrElse("")
              case _ =>
                val vs = c.getElementsByTagName("v")
                if (vs.getLength == 0) "" else vs.item(0).getTextContent
            }
            if (v.nonEmpty) m += idx -> v
          }
          m.result()
        }
      }
    } finally zip.close()
  }

  /** The review-sheet shape the J8 semi-join consumes: one row per
    * reviewed subject across all sheets. `examdate` keeps the raw cell
    * text (Excel serial or string), as the reference keeps `.value`. */
  def readReviewSheet(spark: SparkSession, path: String): DataFrame = {
    val rows = readXlsxRows(path).flatMap { sheet =>
      sheet.drop(1) // header row, per sheet
        .filter(_.get(3).exists(_.nonEmpty)) // 4th column non-empty
        .map(r => (r.getOrElse(0, ""), r.getOrElse(1, ""),
          r.getOrElse(2, ""), r(3)))
    }
    import spark.implicits._
    rows.toDF("proto", "examdate", "sujname", "comment")
  }
}
