package graft

import java.io.FileOutputStream
import java.util.zip.{CRC32, ZipEntry, ZipFile, ZipOutputStream}

import graft.sources.FsIO
import graft.sources.zip.RangedZip

/** The ranged-read zip road (ADVICE r6): central-directory parse + bounded
  * entry streams over the Hadoop-FS layer, so metadata probes and sheet
  * decodes never copy a remote container. Parity-pinned to
  * `java.util.zip.ZipFile` on the same archives. */
class RangedZipSpec extends SparkSpec {

  private def writeZip(path: String, entries: Seq[(String, Array[Byte], Boolean)]): Unit = {
    val out = new ZipOutputStream(new FileOutputStream(path))
    entries.foreach { case (name, content, stored) =>
      val e = new ZipEntry(name)
      if (stored) {
        // STORED entries must pre-declare size+crc on a non-seekable sink
        e.setMethod(ZipEntry.STORED)
        e.setSize(content.length)
        val crc = new CRC32; crc.update(content)
        e.setCrc(crc.getValue)
      }
      out.putNextEntry(e)
      out.write(content)
      out.closeEntry()
    }
    out.close()
  }

  test("central directory + entry bytes match ZipFile, deflated and stored") {
    val dir = tmpDir("rz")
    val p = dir.resolve("a.zip").toString
    val big = Array.tabulate[Byte](300 * 1024)(i => (i % 251).toByte)
    val entries = Seq(
      ("meta/tiny.xml", "<a>hi</a>".getBytes("UTF-8"), false),
      ("data/big.bin", big, false),
      ("stored.txt", "uncompressed payload".getBytes("UTF-8"), true),
      ("empty.txt", Array.empty[Byte], false))
    writeZip(p, entries)
    val view = new RangedZip.ZipView(p)
    val zf = new ZipFile(p)
    try {
      val zfNames = {
        val e = zf.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result().toSet
      }
      assert(view.entries.keySet == zfNames)
      entries.foreach { case (name, content, _) =>
        assert(view.readAll(name).get.toSeq == content.toSeq, name)
        assert(view.entries(name).uncompressedSize == content.length.toLong)
      }
      assert(view.readAll("absent").isEmpty)
    } finally zf.close()
  }

  test("zip with a trailing comment still finds the end record") {
    val dir = tmpDir("rzc")
    val p = dir.resolve("c.zip").toString
    val out = new ZipOutputStream(new FileOutputStream(p))
    out.setComment("archive comment with sig-ish bytes PK inside")
    out.putNextEntry(new ZipEntry("x.txt"))
    out.write("payload".getBytes("UTF-8"))
    out.closeEntry()
    out.close()
    val view = new RangedZip.ZipView(p)
    assert(new String(view.readAll("x.txt").get, "UTF-8") == "payload")
  }

  test("remote-scheme metadata probe never spills the container") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.spill.impl", classOf[SpillFs].getName)
    FsIO.install(FsIO.captureProps(spark))
    val dir = tmpDir("rzs")
    val p = dir.resolve("probe.zip").toString
    writeZip(p, Seq(
      ("xl/workbook.xml", "<w/>".getBytes("UTF-8"), false),
      ("big.bin", Array.fill[Byte](512 * 1024)(7), false)))
    val before = FsIO.spillCount.get()
    val view = new RangedZip.ZipView("spill:" + p)
    assert(new String(view.readAll("xl/workbook.xml").get, "UTF-8") == "<w/>")
    assert(FsIO.spillCount.get() == before,
      "ranged metadata probe must not localize the container")
  }

  test("xlsx sheet-list probe and sheet decode run spill-free on a remote scheme") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.spill.impl", classOf[SpillFs].getName)
    FsIO.install(FsIO.captureProps(spark))
    val relsNs =
      "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val mainNs =
      "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val dir = tmpDir("rzx")
    val p = dir.resolve("book.xlsx").toString
    writeZip(p, Seq(
      ("xl/workbook.xml" ->
        s"""<workbook xmlns="$mainNs" xmlns:r="$relsNs"><sheets>
           |<sheet name="P1" sheetId="1" r:id="rId1"/>
           |</sheets></workbook>""".stripMargin,
        false),
      ("xl/_rels/workbook.xml.rels" ->
        s"""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
           |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
           |</Relationships>""".stripMargin, false),
      ("xl/sharedStrings.xml" ->
        s"""<sst xmlns="$mainNs"><si><t>hi</t></si></sst>""", false),
      ("xl/worksheets/sheet1.xml" ->
        s"""<worksheet xmlns="$mainNs"><sheetData>
           |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>7</v></c></row>
           |</sheetData></worksheet>""".stripMargin, false))
      .map { case ((n, s), st) => (n, s.getBytes("UTF-8"), st) })
    import graft.sources.xlsx.XlsxParser
    val before = FsIO.spillCount.get()
    val sheets = XlsxParser.openSheetList("spill:" + p).get
    assert(sheets.map(_.name) == Seq("P1"))
    val wb = XlsxParser.openWorkbook("spill:" + p).get
    assert(wb.shared == IndexedSeq("hi"))
    val rows = XlsxParser.sheetRows("spill:" + p, sheets.head.target, wb.shared)
    assert(rows == Seq(IndexedSeq("hi", "7")))
    assert(FsIO.spillCount.get() == before,
      "xlsx probe+decode must use the ranged road, not localize()")
  }
}
