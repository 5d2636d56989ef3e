package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction}
import java.nio.file.{Files, Paths}

/** Driver-side file sniffing: encoding detection and delimiter voting.
  *
  * The reference reads the ENTIRE file for both (reference `main.py:194`
  * whole-byte read for charset detection; `main.py:218-219` re-reads all
  * lines once per delimiter sample — O(samples × file)). That cannot scale;
  * here both sniffers read one bounded prefix (default 4 MiB) once. For the
  * sizes where the answers could differ (multi-GiB single text files) the
  * prefix is a statistically sufficient sample, and the scan itself is done
  * by Spark executors, not the driver.
  */
object Sniffers {

  val DefaultDelimiter = "\t"
  val SampleBytes: Int = 4 * 1024 * 1024
  val NumberOfSamples = 15

  /** Candidate delimiters, in `csv.Sniffer`'s preferred order minus the
    * comma: the reference strips commas from every sample before sniffing
    * (`main.py:221-222` — the loop bug means only the comma, not the space,
    * is actually removed), so a comma can never win the vote there either.
    */
  private val Candidates: Seq[Char] = Seq('\t', ';', '|', ':', ' ')

  /** Detect the file encoding, for metadata only.
    *
    * Parity note (`main.py:189-199` + `main.py:339`): the reference detects
    * with charset_normalizer but never passes the result to `open()` — the
    * encoding is *reported, not applied*. We reproduce that: BOM check, then
    * a strict try-decode cascade; reading stays UTF-8 regardless.
    * Returns None on unreadable file (reference returns None on error).
    */
  def detectEncoding(path: String): Option[String] = {
    try {
      val bytes = readPrefix(path, SampleBytes)
      if (bytes.isEmpty) return Some("utf_8")
      bomOf(bytes).orElse {
        if (decodes(bytes, "UTF-8")) {
          if (bytes.forall(b => b >= 0)) Some("ascii") else Some("utf_8")
        } else if (looksUtf16(bytes)) Some("utf_16")
        else if (decodes(bytes, "windows-1251") && hasCyrillicBias(bytes))
          Some("cp1251")
        else Some("latin_1") // latin-1 decodes any byte sequence
      }
    } catch { case _: Exception => None }
  }

  private def bomOf(b: Array[Byte]): Option[String] = {
    if (b.length >= 3 && b(0) == 0xef.toByte && b(1) == 0xbb.toByte && b(2) == 0xbf.toByte)
      Some("utf_8")
    else if (b.length >= 2 && b(0) == 0xff.toByte && b(1) == 0xfe.toByte)
      Some("utf_16")
    else if (b.length >= 2 && b(0) == 0xfe.toByte && b(1) == 0xff.toByte)
      Some("utf_16")
    else None
  }

  private def decodes(bytes: Array[Byte], charset: String): Boolean = {
    val dec: CharsetDecoder = Charset
      .forName(charset)
      .newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(ByteBuffer.wrap(bytes)); true }
    catch { case _: Exception => false }
  }

  /** UTF-16 without BOM shows as ~half the bytes being 0x00. */
  private def looksUtf16(b: Array[Byte]): Boolean = {
    val zeros = b.count(_ == 0)
    b.length >= 4 && zeros * 3 > b.length
  }

  private def hasCyrillicBias(b: Array[Byte]): Boolean =
    // cp1251 Cyrillic letters occupy 0xC0-0xFF
    b.count(x => (x & 0xff) >= 0xc0) * 4 > b.count(_ < 0)

  /** Majority-vote delimiter detection over sampled lines.
    *
    * Reference semantics (`main.py:201-236`): sample 15 line positions
    * spread evenly (`step = line_count // 15`, positions `step * i`), strip
    * commas from each sample (the `main.py:221-222` loop quirk — spaces are
    * NOT stripped), `csv.Sniffer().sniff` each, majority vote; ANY sniff
    * failure (e.g. a sample with no delimiter at all) returns the default
    * tab immediately.
    *
    * Our sniff-per-line: the candidate character (tab, `;`, `|`, `:`,
    * space) with the highest occurrence count in the comma-stripped line; a
    * line where no candidate occurs = sniff failure = default tab.
    */
  def detectDelimiter(path: String): String = {
    try {
      val text = new String(readPrefix(path, SampleBytes), "UTF-8")
      val lines = text.split("\n", -1).toIndexedSeq
      // reference counts '\n' chars, so a trailing newline doesn't create a
      // sampled empty last line (positions stay within 0..lineCount-1 only
      // when lineCount >= samples; with fewer lines all positions are 0)
      val lineCount = text.count(_ == '\n')
      val step = lineCount / NumberOfSamples
      val votes = scala.collection.mutable.ArrayBuffer.empty[Char]
      var i = 0
      while (i < NumberOfSamples) {
        val pos = step * i
        if (pos >= lines.length) return DefaultDelimiter
        val sample = lines(pos).replace(",", "")
        sniffLine(sample) match {
          case Some(d) => votes += d
          case None    => return DefaultDelimiter // sniff failure → default
        }
        i += 1
      }
      if (votes.isEmpty) DefaultDelimiter
      else {
        // majority vote; ties broken by candidate preference order
        val grouped = votes.groupBy(identity).view.mapValues(_.size).toMap
        val best = grouped.values.max
        Candidates.find(c => grouped.getOrElse(c, 0) == best).map(_.toString)
          .getOrElse(DefaultDelimiter)
      }
    } catch { case _: Exception => DefaultDelimiter }
  }

  private def sniffLine(line: String): Option[Char] = {
    if (line.isEmpty) None
    else {
      val counts = Candidates.map(c => c -> line.count(_ == c))
      val (bestC, bestN) = counts.maxBy(_._2)
      if (bestN == 0) None
      else Some(counts.find(_._2 == bestN).map(_._1).getOrElse(bestC))
    }
  }

  /** Read at most `limit` bytes from the head of the file. */
  private def readPrefix(path: String, limit: Int): Array[Byte] = {
    val p = Paths.get(path)
    val size = Files.size(p)
    if (size <= limit) Files.readAllBytes(p)
    else {
      val in = Files.newInputStream(p)
      try in.readNBytes(limit)
      finally in.close()
    }
  }
}
