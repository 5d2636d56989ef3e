package graft.sources

import graft.model.ParserAnswer
import graft.sources.html.HtmlParser
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** HTML importer — the one major format family the reference lacks
  * (its extension table, reference `main.py:147-165`, stops at
  * spreadsheet/text/pdf/parquet/json/pickle), added because web pages are
  * THE dominant LLM-corpus source. Two extraction modes, both via the
  * lenient from-spec reader ([[graft.sources.html.HtmlParser]]):
  *
  *  - `<table>` elements, one answer per table (the `pandas.read_html`
  *    shape users of the reference reach for): rows = `<tr>`, cells =
  *    `<td>`/`<th>` text, entity-decoded, ragged rows null-padded to the
  *    widest row with positional string columns — exactly the
  *    SpreadsheetML importer's frame discipline;
  *  - no tables → MAIN-CONTENT fallback: boilerplate-classified blocks
  *    (jusText-lite link-density + min-words gate), one row per retained
  *    block in a single positional column — the web-corpus curation
  *    entry path ([[graft.queries.ScaleQueries]] q176 runs the same
  *    classifier distributed);
  *  - no tables AND no content blocks → single Failed answer (never
  *    throws — the `main.py:140-144` error-answer contract).
  *
  * Encoding: detected like the text importer (report-only semantics —
  * the detected name is recorded in the answer; the decode itself is
  * UTF-8-lenient, which subsumes ASCII and survives stray bytes).
  *
  * Driver-side by design, like [[PdfImporter]]: one HTML file is one
  * document; at scale parallelism comes from many files
  * ([[graft.operators.BulkIngest]]), not from inside one.
  */
class HtmlImporter(val spark: SparkSession, val filePath: String)
    extends Importer {
  override def engineName: String = "ImportHTML"

  def work(): Seq[ParserAnswer] = {
    try {
      val bytes = FsIO.readAllBytes(filePath)
      // HTML declares its own charset: honor <meta charset=...> /
      // <meta http-equiv Content-Type ... charset=...> from the byte
      // prefix (the WHATWG prescan), fall back to the byte sniffer, then
      // UTF-8 (which subsumes ASCII and survives stray bytes)
      val encoding = HtmlImporter.metaCharset(bytes)
        .orElse(Sniffers.detectEncoding(filePath))
        .getOrElse("utf-8")
      val cs =
        try java.nio.charset.Charset.forName(encoding)
        catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
      val html = new String(bytes, cs)
      val tables = HtmlParser.tables(html)
      if (tables.nonEmpty) {
        tables.zipWithIndex.map { case (rows, idx) =>
          val width = rows.map(_.length).max
          val schema = TextImporter.positionalSchema(width)
          val padded = rows.map { r =>
            org.apache.spark.sql.Row.fromSeq(
              r.padTo(width, null).map(v => v: Any))
          }
          ParserAnswer(
            spark.createDataFrame(padded.asJava, schema), filePath,
            sheetName = s"table$idx", encoding = encoding,
            engine = engineName, knownRowCount = Some(rows.length.toLong))
        }
      } else {
        val main = HtmlParser.blocks(html).filterNot(HtmlParser.isBoiler(_))
        if (main.isEmpty) return failedAnswer()
        val schema = TextImporter.positionalSchema(1)
        val rows = main.map(b => org.apache.spark.sql.Row(b.text))
        Seq(ParserAnswer(
          spark.createDataFrame(rows.asJava, schema), filePath,
          sheetName = "HTML main content", encoding = encoding,
          engine = engineName, knownRowCount = Some(main.length.toLong)))
      }
    } catch { case _: Exception => failedAnswer() }
  }
}

object HtmlImporter {
  /** WHATWG-style charset prescan over the first 1024 bytes: the value of
    * the first `charset=` attribute inside a `<meta ...>` tag (covers both
    * the HTML5 `<meta charset="x">` and the legacy http-equiv
    * `content="text/html; charset=x"` spellings — the attribute text is
    * ASCII either way). */
  private[graft] def metaCharset(bytes: Array[Byte]): Option[String] = {
    val n = math.min(bytes.length, 1024)
    val prefix = new String(bytes, 0, n,
      java.nio.charset.StandardCharsets.US_ASCII).toLowerCase
    val meta = "<meta\\s[^>]*charset\\s*=\\s*[\"']?([a-z0-9_\\-]+)".r
    meta.findFirstMatchIn(prefix).map(_.group(1))
  }
}
