package graft.operators

import java.nio.charset.StandardCharsets

/** Deterministic web-corpus fixture builders — the q50/q173 discipline
  * applied to HTML/WARC: each document's tokens are wrapped in a REAL page
  * with planted boilerplate (nav / link-heavy sidebar / footer) and,
  * per shard, a REAL ISO 28500 WARC file, so the lenient readers
  * ([[graft.sources.html.HtmlParser]], [[graft.sources.warc.WarcReader]])
  * exercise their actual parse paths while the DuckDB oracle replays the
  * generative arithmetic (it can reconstruct every byte from
  * documents.text + doc_id).
  *
  * Block inventory of [[page]] — chosen so the jusText-lite gate
  * (min 5 words, link density ≥ 3000 bp) classifies exactly the planted
  * boilerplate:
  *
  *  - nav: 4 words, 4 in links → 10000 bp → boilerplate;
  *  - sidebar: 5 words, 3 in links → 6000 bp → boilerplate;
  *  - footer: 4 words (< 5), 3 in links (7500 bp) → boilerplate twice over;
  *  - content paragraphs: 20-token chunks, zero links → kept, EXCEPT a
  *    trailing chunk of 1–4 words (< 5) — the short-tail drop the
  *    classifier is supposed to make, and the oracle prices it in.
  */
object WebCorpus {

  /** Tokens per content paragraph (≠ q175's 6 and q101's 8, keeping the
    * three operators' chunk artifacts independent). */
  final val ParagraphTokens = 20

  /** Documents per synthetic WARC shard. */
  final val ShardDocs = 8

  /** The synthetic page around a document's tokens. */
  def page(docId: Long, tokens: IndexedSeq[String]): String = {
    val sb = new StringBuilder(256 + tokens.foldLeft(0)(_ + _.length + 1))
    sb.append("<html><head><title>Doc ").append(docId)
      .append("</title></head><body>\n")
    sb.append("<nav class=\"menu\"><a href=\"/\">home</a> " +
      "<a href=\"/about\">about us</a> " +
      "<a href=\"/contact\">contact</a></nav>\n")
    val nchunks = (tokens.length + ParagraphTokens - 1) / ParagraphTokens
    var k = 0
    while (k < nchunks) {
      sb.append("<p>")
      val from = k * ParagraphTokens
      val until = math.min(from + ParagraphTokens, tokens.length)
      var i = from
      while (i < until) {
        if (i > from) sb.append(' ')
        sb.append(tokens(i))
        i += 1
      }
      sb.append("</p>\n")
      if (k == 0)
        sb.append("<div class=\"side\">related reading " +
          "<a href=\"/more\">more stories here</a></div>\n")
      k += 1
    }
    sb.append("<footer>copyright <a href=\"/terms\">terms</a> " +
      "<a href=\"/privacy\">privacy</a> " +
      "<a href=\"/imprint\">imprint</a></footer>\n")
    sb.append("</body></html>\n")
    sb.toString
  }

  /** One ISO 28500 response record around a page. */
  def warcRecord(docId: Long, html: String): Array[Byte] = {
    val payload = html.getBytes(StandardCharsets.UTF_8)
    val hdr = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: http://corpus.local/doc/$docId\r\n" +
      s"WARC-Record-ID: <urn:graft:$docId>\r\n" +
      "Content-Type: text/html\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n").getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](hdr.length + payload.length + 4)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    System.arraycopy(payload, 0, out, hdr.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Whitespace tokens, the corpus-wide splitter. */
  def tokens(text: String): IndexedSeq[String] =
    text.split("\\s+").filter(_.nonEmpty).toIndexedSeq
}
