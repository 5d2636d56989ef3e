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
  * Slide order is AUTHORITATIVE: `ppt/presentation.xml`'s `p:sldIdLst`
  * dereferenced through `ppt/_rels/presentation.xml.rels` (the same
  * two-part metadata walk the xlsx sheet list runs) — a deck whose part
  * numbers disagree with the presentation order still answers in the
  * order the user sees. Parts the list doesn't reference append in
  * numeric-name order; a missing/damaged presentation.xml or rels falls
  * back to the numeric sort of `slideN.xml` names. Only metadata and
  * slide parts are pulled from the container (ranged-zip road) —
  * masters, layouts, notes and media are never read.
  */
object PptxParser {

  final case class Slide(
      name: String, // "slide1", "slide2", … (part name, numeric order)
      tables: Seq[Seq[IndexedSeq[String]]],
      paragraphs: Seq[String])

  private val SlideName = "^ppt/slides/slide([0-9]+)\\.xml$".r

  /** Presentation order of the slide parts: `p:sldIdLst`'s `r:id`s in
    * document order, each dereferenced through the presentation rels to
    * its part name. Unreferenced parts append in numeric-name order;
    * None when either metadata part is absent/corrupt or references no
    * known slide — callers keep the numeric-sort fallback. Both parts
    * are few-hundred-byte metadata, so DOM loads are fine (the xlsx
    * sheet-list discipline). */
  private def orderedByPresentation(
      open: String => Option[java.io.InputStream],
      slideEntries: Seq[(Int, String)]): Option[Seq[(Int, String)]] = {
    def loadXml(name: String): Option[scala.xml.Elem] =
      open(name).flatMap { in =>
        try Some(scala.xml.XML.load(in))
        catch { case _: Exception => None }
        finally in.close()
      }
    val RelNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    for {
      pres <- loadXml("ppt/presentation.xml")
      rels <- loadXml("ppt/_rels/presentation.xml.rels")
    } yield {
      // resolve the target against the source part's base (ppt/) with
      // dot-segment handling (OPC §9.3 relative references): both
      // "slides/slide1.xml" and "../ppt/slides/slide1.xml" are legal
      def partName(t: String): String = {
        val raw = if (t.startsWith("/")) t.substring(1) else s"ppt/$t"
        raw.split("/").foldLeft(List.empty[String]) {
          case (acc, "..") => if (acc.nonEmpty) acc.tail else acc
          case (acc, ".") => acc
          case (acc, seg) => seg :: acc
        }.reverse.mkString("/")
      }
      val rid2part: Map[String, String] = (rels \\ "Relationship").flatMap { r =>
        for {
          id <- r.attribute("Id").map(_.text)
          t <- r.attribute("Target").map(_.text)
        } yield id -> partName(t)
      }.toMap
      val orderedParts: Seq[String] = (pres \ "sldIdLst" \ "sldId")
        .flatMap(_.attribute(RelNs, "id")).map(_.text)
        .flatMap(rid2part.get)
      val byName = slideEntries.map(e => e._2 -> e).toMap
      val inOrder = orderedParts.flatMap(byName.get)
      val rest = slideEntries.filterNot(inOrder.contains)
      if (inOrder.isEmpty) return None
      inOrder ++ rest
    }
  }

  /** Numeric-name entries reordered by the presentation metadata when it
    * resolves, numeric fallback otherwise. */
  private def slideSequence(
      open: String => Option[java.io.InputStream],
      slideEntries: Seq[(Int, String)]): Seq[(Int, String)] =
    orderedByPresentation(open, slideEntries).getOrElse(slideEntries)

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
    val sequenced = slideSequence(n => view.open(n), slideEntries)
    val slides = sequenced.map { case (idx, entry) =>
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
          def openEntry(n: String): Option[java.io.InputStream] =
            Option(zip.getEntry(n)).map(zip.getInputStream)
          if (slideEntries.isEmpty) None
          else Some(slideSequence(openEntry, slideEntries).map { case (idx, entry) =>
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
