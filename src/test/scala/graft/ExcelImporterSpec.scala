package graft

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.Row

/** FIXTURES.md §A4: hand-built minimal OOXML / OpenDocument containers. */
class ExcelImporterSpec extends SparkSpec {

  private def writeZip(path: String, entries: (String, String)*): Unit = {
    val out = new ZipOutputStream(new FileOutputStream(path))
    entries.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    out.close()
  }

  private val relsNs =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
  private val mainNs =
    "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

  private def makeXlsx(path: String): Unit = writeZip(
    path,
    "xl/workbook.xml" ->
      s"""<workbook xmlns="$mainNs" xmlns:r="$relsNs"><sheets>
         |<sheet name="My_page_1" sheetId="1" r:id="rId1"/>
         |<sheet name="My_page_2" sheetId="2" r:id="rId2"/>
         |</sheets></workbook>""".stripMargin,
    "xl/_rels/workbook.xml.rels" ->
      s"""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
         |<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>
         |</Relationships>""".stripMargin,
    "xl/sharedStrings.xml" ->
      s"""<sst xmlns="$mainNs" count="2" uniqueCount="2">
         |<si><t>hello</t></si><si><r><t>wo</t></r><r><t>rld</t></r></si>
         |</sst>""".stripMargin,
    "xl/worksheets/sheet1.xml" ->
      s"""<worksheet xmlns="$mainNs"><sheetData>
         |<row r="1">
         |  <c r="A1" t="s"><v>0</v></c>
         |  <c r="B1"><v>42</v></c>
         |  <c r="C1"><v>1.5</v></c>
         |</row>
         |<row r="2">
         |  <c r="A2" t="inlineStr"><is><t>inline</t></is></c>
         |  <c r="C2" t="b"><v>1</v></c>
         |</row>
         |<row r="4">
         |  <c r="A4" t="s"><v>1</v></c>
         |</row>
         |</sheetData></worksheet>""".stripMargin,
    "xl/worksheets/sheet2.xml" ->
      s"""<worksheet xmlns="$mainNs"><sheetData>
         |<row r="1"><c r="A1"><v>9</v></c></row>
         |<row r="2"/>
         |</sheetData></worksheet>""".stripMargin
  )

  test("xlsx: sheet order, shared/inline/bool/numeric cells, gaps, blank rows") {
    val dir = tmpDir("xlsx")
    val p = dir.resolve("book.xlsx").toString
    makeXlsx(p)
    val answers = AnyFile.parse(spark, p)
    assert(answers.map(_.sheetName) == Seq("My_page_1", "My_page_2"))
    assert(answers.forall(_.engine == "ImportExcel"))

    val s1 = answers(0).data.collect()
    assert(answers(0).data.columns.toSeq == Seq("0", "1", "2"))
    // raw stored values as strings, all-string schema
    assert(s1(0) == Row("hello", "42", "1.5"))
    // B2 missing → null gap; boolean rendered like pandas str(bool)
    assert(s1(1) == Row("inline", null, "True"))
    // row 3 has no <row> element → all-null row (openpyxl max_row semantics)
    assert(s1(2) == Row(null, null, null))
    assert(s1(3) == Row("world", null, null)) // multi-run shared string

    val s2 = answers(1).data.collect()
    assert(s2.length == 2) // trailing empty <row/> element kept
    assert(s2(0) == Row("9"))
    assert(s2(1) == Row(null))
  }

  test("ods: typed cells raw, repeated columns, trailing filler trimmed") {
    val dir = tmpDir("ods")
    val p = dir.resolve("sheet.ods").toString
    val tableNs = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
    val officeNs = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    val textNs = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    writeZip(p, "content.xml" ->
      s"""<office:document-content xmlns:office="$officeNs" xmlns:table="$tableNs" xmlns:text="$textNs">
         |<office:body><office:spreadsheet>
         |<table:table table:name="T1">
         |<table:table-row>
         |  <table:table-cell office:value-type="string"><text:p>a</text:p></table:table-cell>
         |  <table:table-cell office:value-type="float" office:value="2.5"/>
         |  <table:table-cell table:number-columns-repeated="2" office:value-type="string"><text:p>x</text:p></table:table-cell>
         |  <table:table-cell table:number-columns-repeated="1000"/>
         |</table:table-row>
         |<table:table-row table:number-rows-repeated="2">
         |  <table:table-cell office:value-type="boolean" office:boolean-value="true"/>
         |  <table:table-cell office:value-type="date" office:date-value="2020-01-02"/>
         |</table:table-row>
         |</table:table>
         |</office:spreadsheet></office:body></office:document-content>""".stripMargin)
    val answers = AnyFile.parse(spark, p)
    assert(answers.length == 1)
    assert(answers.head.sheetName == "T1")
    val rows = answers.head.data.collect()
    assert(answers.head.data.columns.length == 4) // 1000-col filler trimmed
    assert(rows(0) == Row("a", "2.5", "x", "x"))
    assert(rows(1) == Row("True", "2020-01-02", null, null))
    assert(rows(2) == Row("True", "2020-01-02", null, null)) // row repeat
  }

  test("ods: non-empty repeats expand fully past the filler cap") {
    val dir = tmpDir("odsrep")
    val p = dir.resolve("rep.ods").toString
    val tableNs = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
    val officeNs = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    val textNs = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    // 4100 > MaxFill(4096): a VALUE repeated past the cap must not be
    // truncated (the cap exists only for empty filler); the repeated
    // non-empty ROW must also expand fully
    writeZip(p, "content.xml" ->
      s"""<office:document-content xmlns:office="$officeNs" xmlns:table="$tableNs" xmlns:text="$textNs">
         |<office:body><office:spreadsheet>
         |<table:table table:name="R">
         |<table:table-row table:number-rows-repeated="4100">
         |  <table:table-cell office:value-type="string"><text:p>v</text:p></table:table-cell>
         |  <table:table-cell table:number-columns-repeated="99999"/>
         |</table:table-row>
         |</table:table>
         |</office:spreadsheet></office:body></office:document-content>""".stripMargin)
    val a = AnyFile.parse(spark, p).head
    assert(a.data.columns.length == 1) // empty 99999-col filler still capped+trimmed
    assert(a.data.count() == 4100L)
    assert(a.data.distinct().collect().toSeq == Seq(Row("v")))
  }

  test("corrupt xlsb → Failed answer, no exception") {
    val dir = tmpDir("bin")
    val p = writeFile(dir, "modern.xlsb", "not really excel")
    val a = AnyFile.parse(spark, p).head
    assert(a.parseInfo == "Failed")
    assert(a.engine == "ImportExcel")
  }

  test("zip without workbook.xml → Failed answer") {
    val dir = tmpDir("badzip")
    val p = dir.resolve("weird.xlsx").toString
    writeZip(p, "mimetype" -> "whatever")
    assert(AnyFile.parse(spark, p).head.parseInfo == "Failed")
  }
}
