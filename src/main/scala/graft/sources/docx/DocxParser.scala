package graft.sources.docx

import javax.xml.stream.XMLStreamConstants._

import scala.collection.mutable

import graft.sources.StaxUtil
import graft.sources.zip.RangedZip

/** WordprocessingML (`.docx`) reader — zip + `word/document.xml`, the same
  * container/part layout the xlsx road reads (OPC, ECMA-376 part 2; the
  * document markup is ECMA-376 part 1 §17). Extraction mirrors the HTML
  * importer's two frame shapes:
  *
  *  - `<w:tbl>` elements → tables: rows = `<w:tr>`, cells = `<w:tc>` with
  *    the cell's paragraphs newline-joined. Tables nest (a `<w:tc>` may
  *    hold a whole `<w:tbl>`); only depth-1 tables become frames — nested
  *    table text folds into the enclosing cell, which is what a flat
  *    data-frame rendering of the page can honestly represent.
  *  - body `<w:p>` paragraphs (outside any table) → the document's text,
  *    one string per non-empty paragraph.
  *
  * Text assembly is from-spec: `<w:t>` carries the characters (including
  * whitespace-only runs — `xml:space` is irrelevant to StAX text events),
  * `<w:tab/>` is a tab, `<w:br/>`/`<w:cr/>` are line breaks, and
  * everything else (run/paragraph properties, proofing marks, bookmarks)
  * contributes nothing. Deleted-text (`<w:delText>`) is tracked-changes
  * markup, not document content, and is skipped. Element matching is by
  * LOCAL name only: producers disagree on the `w:` prefix, and strict
  * namespace checks are exactly the brittleness the lenient-parser
  * discipline (PdfParser, HtmlParser) avoids.
  */
object DocxParser {

  final case class Doc(
      tables: Seq[Seq[IndexedSeq[String]]],
      paragraphs: Seq[String])

  /** Parse `word/document.xml` out of the container at `path`.
    * None = not a docx we can read (no document part, malformed XML). */
  def parse(path: String): Option[Doc] = {
    val opened = RangedZip.entryStreamOrLocalize(path, "word/document.xml")
    opened match {
      case None => None
      case Some((in, close)) =>
        try Some(readDocument(in))
        catch { case _: Exception => None }
        finally close()
    }
  }

  private def readDocument(in: java.io.InputStream): Doc = {
    val r = StaxUtil.reader(in)

    val tables = mutable.ArrayBuffer.empty[Seq[IndexedSeq[String]]]
    val paragraphs = mutable.ArrayBuffer.empty[String]

    // depth-1 table under construction
    var rows: mutable.ArrayBuffer[IndexedSeq[String]] = null
    var row: mutable.ArrayBuffer[String] = null
    // current cell text; inside a cell, paragraph boundaries join with \n
    var cell: java.lang.StringBuilder = null
    var cellParas = 0
    // body paragraph under construction (outside any table)
    var para: java.lang.StringBuilder = null

    var tblDepth = 0
    var skipDepth = 0 // inside <w:delText> (or other skipped subtree)
    var inT = false   // inside <w:t> — the ONLY element carrying run text

    def append(s: String): Unit = {
      if (skipDepth > 0) ()
      else if (cell != null) cell.append(s)
      else if (para != null) para.append(s)
    }

    while (r.hasNext) {
      r.next() match {
        case START_ELEMENT =>
          val n = r.getLocalName
          if (skipDepth > 0) skipDepth += 1
          else n match {
            case "tbl" =>
              tblDepth += 1
              if (tblDepth == 1) {
                // a body paragraph cannot span a table; drop any half-open one
                para = null
                rows = mutable.ArrayBuffer.empty
              }
            case "tr" if tblDepth == 1 =>
              row = mutable.ArrayBuffer.empty
            case "tc" if tblDepth == 1 =>
              cell = new java.lang.StringBuilder
              cellParas = 0
            case "p" =>
              if (cell != null) {
                if (cellParas > 0) cell.append('\n')
                cellParas += 1
              } else if (tblDepth == 0) para = new java.lang.StringBuilder
            case "t" => inT = true
            case "tab" => append("\t")
            case "br" | "cr" => append("\n")
            case "delText" | "instrText" =>
              // tracked-change deletions and field codes are not content
              skipDepth = 1
            case _ => ()
          }

        case END_ELEMENT =>
          if (skipDepth > 0) skipDepth -= 1
          else r.getLocalName match {
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
          // only <w:t> holds document text; character events anywhere else
          // (pretty-printing whitespace, rsid noise) are not content
          if (inT) append(r.getText)

        case _ => ()
      }
    }
    r.close()
    Doc(tables.toSeq, paragraphs.toSeq)
  }
}
