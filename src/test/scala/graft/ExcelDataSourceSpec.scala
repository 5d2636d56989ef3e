package graft

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** The DSv2 `graft-excel` format: direct reads, sheet option, schema
  * inference, and pushed-down column pruning. */
class ExcelDataSourceSpec extends SparkSpec {

  private val relsNs =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
  private val mainNs =
    "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

  private def makeXlsx(path: String): Unit = {
    val out = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    entry("xl/workbook.xml",
      s"""<workbook xmlns="$mainNs" xmlns:r="$relsNs"><sheets>
         |<sheet name="S1" sheetId="1" r:id="rId1"/>
         |<sheet name="S2" sheetId="2" r:id="rId2"/>
         |</sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      s"""<worksheet xmlns="$mainNs"><sheetData>
         |<row r="1"><c r="A1"><v>1</v></c><c r="B1"><v>2</v></c><c r="C1"><v>3</v></c></row>
         |<row r="2"><c r="A2"><v>4</v></c><c r="C2"><v>6</v></c></row>
         |</sheetData></worksheet>""".stripMargin)
    entry("xl/worksheets/sheet2.xml",
      s"""<worksheet xmlns="$mainNs"><sheetData>
         |<row r="1"><c r="A1"><v>9</v></c></row>
         |</sheetData></worksheet>""".stripMargin)
    out.close()
  }

  private lazy val xlsxPath: String = {
    val p = tmpDir("dsv2").resolve("t.xlsx").toString
    makeXlsx(p)
    p
  }

  test("format(graft-excel): default sheet, inferred schema, gap cells") {
    val df = spark.read.format("graft-excel").load(xlsxPath)
    assert(df.columns.toSeq == Seq("0", "1", "2"))
    assert(df.collect().toSeq == Seq(Row("1", "2", "3"), Row("4", null, "6")))
  }

  test("sheet option selects other sheets") {
    val df = spark.read.format("graft-excel").option("sheet", "S2").load(xlsxPath)
    assert(df.collect().toSeq == Seq(Row("9")))
  }

  test("column pruning reaches the scan") {
    val df = spark.read.format("graft-excel").load(xlsxPath).select("2")
    val scanOutputs = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.output.map(_.name)
    }
    assert(scanOutputs.nonEmpty)
    assert(scanOutputs.head == Seq("2"), s"scan not pruned: $scanOutputs")
    assert(df.collect().toSeq == Seq(Row("3"), Row("6")))
  }

  test("unknown sheet errors clearly") {
    val e = intercept[Exception] {
      spark.read.format("graft-excel").option("sheet", "nope").load(xlsxPath)
        .collect()
    }
    assert(e.getMessage.contains("no sheet named"))
  }
}
