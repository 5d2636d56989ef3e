package graft

import org.apache.spark.sql.Row

/** FIXTURES.md §A5: MS SpreadsheetML semantics. */
class XmlImporterSpec extends SparkSpec {

  private val ns = "urn:schemas-microsoft-com:office:spreadsheet"

  private def book(body: String): String =
    s"""<?xml version="1.0"?><Workbook xmlns:ss="$ns">$body</Workbook>"""

  test("worksheet with ragged rows: skip empty rows, null-pad, name attr") {
    val dir = tmpDir("xml")
    val p = writeFile(dir, "b.xml", book(
      """<ss:Worksheet ss:Name="Sheet_A"><ss:Table>
        |<ss:Row><ss:Cell><ss:Data>r0c0</ss:Data></ss:Cell><ss:Cell><ss:Data>r0c1</ss:Data></ss:Cell></ss:Row>
        |<ss:Row/>
        |<ss:Row><ss:Cell><ss:Data>r2c0</ss:Data></ss:Cell></ss:Row>
        |</ss:Table></ss:Worksheet>""".stripMargin))
    val answers = AnyFile.parse(spark, p)
    assert(answers.length == 1)
    val a = answers.head
    assert(a.sheetName == "Sheet_A")
    assert(a.engine == "ImportXML")
    assert(a.parseInfo == "OK")
    val rows = a.data.collect()
    assert(rows.length == 2) // zero-Data row SKIPPED (main.py:320)
    assert(rows(0) == Row("r0c0", "r0c1"))
    assert(rows(1) == Row("r2c0", null)) // ragged → null pad
  }

  test("two worksheets → two answers in order") {
    val dir = tmpDir("xml2")
    val p = writeFile(dir, "b.xml", book(
      """<ss:Worksheet ss:Name="S1"><ss:Table>
        |<ss:Row><ss:Cell><ss:Data>a</ss:Data></ss:Cell></ss:Row></ss:Table></ss:Worksheet>
        |<ss:Worksheet ss:Name="S2"><ss:Table>
        |<ss:Row><ss:Cell><ss:Data>b</ss:Data></ss:Cell></ss:Row></ss:Table></ss:Worksheet>""".stripMargin))
    val answers = AnyFile.parse(spark, p)
    assert(answers.map(_.sheetName) == Seq("S1", "S2"))
    assert(answers.map(_.data.collect().head.getString(0)) == Seq("a", "b"))
  }

  test("table without worksheet → sheet 'Not defined'") {
    val dir = tmpDir("xml3")
    val p = writeFile(dir, "b.xml", book(
      """<ss:Table><ss:Row><ss:Cell><ss:Data>x</ss:Data></ss:Cell></ss:Row></ss:Table>"""))
    val a = AnyFile.parse(spark, p).head
    assert(a.sheetName == "Not defined")
    assert(a.data.collect().head == Row("x"))
  }

  test("no recognized nodes → single Failed answer with engine") {
    val dir = tmpDir("xml4")
    val p = writeFile(dir, "b.xml", "<other><stuff/></other>")
    val a = AnyFile.parse(spark, p).head
    assert(a.parseInfo == "Failed")
    assert(a.engine == "ImportXML")
  }

  test("mildly malformed XML recovered (recover=True parity)") {
    val dir = tmpDir("xml5")
    val p = writeFile(dir, "b.xml", book(
      """<ss:Worksheet ss:Name="S"><ss:Table>
        |<ss:Row><ss:Cell><ss:Data>a & b</ss:Data></ss:Cell></ss:Row>
        |</ss:Table></ss:Worksheet>""".stripMargin)) // bare & is invalid XML
    val a = AnyFile.parse(spark, p).head
    assert(a.parseInfo == "OK")
    assert(a.data.collect().head.getString(0) == "a & b")
  }

  test("empty Data element → null cell") {
    val dir = tmpDir("xml6")
    val p = writeFile(dir, "b.xml", book(
      """<ss:Worksheet ss:Name="S"><ss:Table>
        |<ss:Row><ss:Cell><ss:Data/></ss:Cell><ss:Cell><ss:Data>v</ss:Data></ss:Cell></ss:Row>
        |</ss:Table></ss:Worksheet>""".stripMargin))
    val rows = AnyFile.parse(spark, p).head.data.collect()
    assert(rows(0) == Row(null, "v"))
  }
}
