package graft.sources

import javax.xml.stream.{XMLInputFactory, XMLStreamReader}

/** Shared StAX configuration for the streaming XML readers (xlsx sheets,
  * shared strings, SpreadsheetML tables). DOM loads were the ingestion
  * layer's scale limiter — a 1M-row sheet becomes a multi-GB tree on
  * whichever node parses it; the JDK-builtin StAX cursor keeps sheet decode
  * O(row) memory with zero extra dependencies.
  */
object StaxUtil {

  /** Coalescing (one CHARACTERS event per text node), external entities and
    * DTDs off (untrusted input; also what lxml/openpyxl effectively do). */
  def reader(in: java.io.InputStream): XMLStreamReader =
    newFactory().createXMLStreamReader(in)

  def reader(src: java.io.Reader): XMLStreamReader =
    newFactory().createXMLStreamReader(src)

  private def newFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newFactory()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f
  }
}
