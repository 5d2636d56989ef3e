package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** The DSv2 `graft-xmlss` format: direct reads, table option, pruning. */
class XmlssDataSourceSpec extends SparkSpec {

  private lazy val path: String = {
    val dir = tmpDir("xmlss")
    writeFile(dir, "b.xml",
      """<?xml version="1.0"?>
        |<Workbook xmlns:ss="urn:schemas-microsoft-com:office:spreadsheet">
        | <ss:Worksheet ss:Name="S1"><ss:Table>
        |  <ss:Row><ss:Cell><ss:Data>a</ss:Data></ss:Cell><ss:Cell><ss:Data>b</ss:Data></ss:Cell></ss:Row>
        |  <ss:Row><ss:Cell><ss:Data>c</ss:Data></ss:Cell></ss:Row>
        | </ss:Table></ss:Worksheet>
        | <ss:Worksheet ss:Name="S2"><ss:Table>
        |  <ss:Row><ss:Cell><ss:Data>x</ss:Data></ss:Cell></ss:Row>
        | </ss:Table></ss:Worksheet>
        |</Workbook>""".stripMargin)
  }

  test("format(graft-xmlss): default table, inferred schema, ragged pad") {
    val df = spark.read.format("graft-xmlss").load(path)
    assert(df.columns.toSeq == Seq("0", "1"))
    assert(df.collect().toSeq == Seq(Row("a", "b"), Row("c", null)))
  }

  test("table option selects the second table") {
    val df = spark.read.format("graft-xmlss").option("table", "1").load(path)
    assert(df.collect().toSeq == Seq(Row("x")))
  }

  test("column pruning reaches the scan") {
    val df = spark.read.format("graft-xmlss").load(path).select("1")
    val scanOutputs = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.output.map(_.name)
    }
    assert(scanOutputs.headOption.contains(Seq("1")), s"not pruned: $scanOutputs")
    assert(df.collect().toSeq == Seq(Row("b"), Row(null)))
  }
}
