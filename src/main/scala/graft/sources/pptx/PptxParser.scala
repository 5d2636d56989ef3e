package graft.sources.pptx

import javax.xml.stream.XMLStreamConstants._

import scala.collection.mutable

import graft.sources.StaxUtil
import graft.sources.zip.RangedZip

/** PresentationML (`.pptx`) reader — OPC zip + `ppt/slides/slideN.xml`,
  * the third member of the Office family next to the xlsx road and
  * [[graft.sources.docx.DocxParser]]. Per slide:
  *
  *  - DrawingML tables (`<a:tbl>` → `<a:tr>` rows / `<a:tc>` cells, cell
  *    paragraphs newline-joined) become frames, the docx discipline;
  *  - text paragraphs (`<a:p>`, runs' `<a:t>` concatenated, `<a:br>` a
  *    line break) outside any table become the slide's text lines.
  *
  * Slide order is the numeric sort of `slideN.xml` names — the honest
  * lenient shortcut (the authoritative order lives in
  * `ppt/presentation.xml` + rels; packages in the wild number slides in
  * presentation order, and a reader that dereferenced rels would still
  * need this fallback for packages with damaged rels). Only slide parts
  * are pulled from the container (ranged-zip road) — masters, layouts,
  * notes and media are never read.
  */
object PptxParser {

  final case class Slide(
      name: String, // "slide1", "slide2", … (part name, numeric order)
      tables: Seq[Seq[IndexedSeq[String]]],
      paragraphs: Seq[String])

  private val SlideName = "^ppt/slides/slide([0-9]+)\\.xml$".r

  /** Parse every slide part. None = not a pptx we can read (no slide
    * parts, unreadable container). */
  def parse(path: String): Option[Seq[Slide]] = {
    val view =
      try new RangedZip.ZipView(path)
      catch { case _: Exception => return parseLocalized(path) }
    val slideEntries = view.entries.keys.toSeq
      .flatMap { n => SlideName.findFirstMatchIn(n).map(m => (m.group(1).toInt, n)) }
      .sortBy(_._1)
    if (slideEntries.isEmpty) return None
    val slides = slideEntries.map { case (idx, entry) =>
      val in = view.open(entry).getOrElse(return None)
      try {
        val (tables, paras) = readSlide(in)
        Slide(s"slide$idx", tables, paras)
      } catch { case _: Exception => return None }
      finally in.close()
    }
    Some(slides)
  }

  /** Containers the ranged reader rejects go through localize+ZipFile,
    * mirroring [[RangedZip.entryStreamOrLocalize]]'s fallback policy. */
  private def parseLocalized(path: String): Option[Seq[Slide]] =
    try {
      graft.sources.FsIO.withLocal(path) { f =>
        val zip = new java.util.zip.ZipFile(f)
        try {
          import scala.jdk.CollectionConverters._
          val slideEntries = zip.entries().asScala.map(_.getName).toSeq
            .flatMap { n => SlideName.findFirstMatchIn(n).map(m => (m.group(1).toInt, n)) }
            .sortBy(_._1)
          if (slideEntries.isEmpty) None
          else Some(slideEntries.map { case (idx, entry) =>
            val in = zip.getInputStream(zip.getEntry(entry))
            try {
              val (tables, paras) = readSlide(in)
              Slide(s"slide$idx", tables, paras)
            } finally in.close()
          })
        } finally zip.close()
      }
    } catch { case _: Exception => None }

  /** One slide part → (tables, non-table paragraphs). Same event
    * discipline as the docx reader: only `<a:t>` carries characters. */
  private def readSlide(in: java.io.InputStream): (Seq[Seq[IndexedSeq[String]]], Seq[String]) = {
    val r = StaxUtil.reader(in)

    val tables = mutable.ArrayBuffer.empty[Seq[IndexedSeq[String]]]
    val paragraphs = mutable.ArrayBuffer.empty[String]

    var rows: mutable.ArrayBuffer[IndexedSeq[String]] = null
    var row: mutable.ArrayBuffer[String] = null
    var cell: java.lang.StringBuilder = null
    var cellParas = 0
    var para: java.lang.StringBuilder = null
    var tblDepth = 0
    var inT = false

    def append(s: String): Unit =
      if (cell != null) cell.append(s)
      else if (para != null) para.append(s)

    while (r.hasNext) {
      r.next() match {
        case START_ELEMENT =>
          r.getLocalName match {
            case "tbl" =>
              tblDepth += 1
              if (tblDepth == 1) { para = null; rows = mutable.ArrayBuffer.empty }
            case "tr" if tblDepth == 1 => row = mutable.ArrayBuffer.empty
            case "tc" if tblDepth == 1 =>
              cell = new java.lang.StringBuilder; cellParas = 0
            case "p" =>
              if (cell != null) {
                if (cellParas > 0) cell.append('\n')
                cellParas += 1
              } else if (tblDepth == 0) para = new java.lang.StringBuilder
            case "t" => inT = true
            case "br" => append("\n")
            case _ => ()
          }
        case END_ELEMENT =>
          r.getLocalName match {
            case "tbl" =>
              if (tblDepth == 1 && rows != null) {
                if (rows.nonEmpty) tables += rows.toSeq
                rows = null
              }
              tblDepth = math.max(0, tblDepth - 1)
            case "tr" if tblDepth == 1 =>
              if (row != null && rows != null && row.nonEmpty)
                rows += row.toIndexedSeq
              row = null
            case "tc" if tblDepth == 1 =>
              if (row != null && cell != null) row += cell.toString
              cell = null
            case "p" =>
              if (cell == null && tblDepth == 0 && para != null) {
                val t = para.toString.trim
                if (t.nonEmpty) paragraphs += t
                para = null
              }
            case "t" => inT = false
            case _ => ()
          }
        case CHARACTERS | CDATA =>
          if (inT) append(r.getText)
        case _ => ()
      }
    }
    r.close()
    (tables.toSeq, paragraphs.toSeq)
  }
}
