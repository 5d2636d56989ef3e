package graft

import graft.model.ParserAnswer
import org.apache.spark.sql.Row

/** Dispatch + JSON orients + parquet + error paths (FIXTURES.md §A6-A8). */
class AnyFileSpec extends SparkSpec {

  test("missing file → Failed with defaults (engine 'Not used' etc.)") {
    val a = AnyFile.parse(spark, "/definitely/not/here.txt").head
    assert(a.parseInfo == "Failed")
    assert(a.engine == "Not used")
    assert(a.encoding == "not applied")
    assert(a.separator == "format defined")
    assert(a.filePath.startsWith("/")) // absolutized
  }

  test("unknown extension → Failed") {
    val dir = tmpDir("unk")
    val p = writeFile(dir, "data.xyz", "whatever")
    assert(AnyFile.parse(spark, p).head.parseInfo == "Failed")
  }

  // pdf now has a real reader (PdfImporterSpec): a non-PDF payload takes
  // its never-throw Failed path; pickle remains the documented gap.
  test("pdf parse failure / pk1 / pickle give Failed with engine recorded") {
    val dir = tmpDir("gap")
    val cases = Seq("d.pdf" -> "ImportPDF", "d.pk1" -> "ImportPickle",
      "d.pickle" -> "ImportPickle")
    cases.foreach { case (name, engine) =>
      val p = writeFile(dir, name, "binary-ish")
      val a = AnyFile.parse(spark, p).head
      assert(a.parseInfo == "Failed")
      assert(a.engine == engine)
    }
  }

  test("json records orient: top-level array → typed frame") {
    val dir = tmpDir("json")
    val p = writeFile(dir, "recs.json",
      """[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]""")
    val a = AnyFile.parse(spark, p).head
    assert(a.sheetName == "JSON file content")
    assert(a.parseInfo == "OK")
    val df = a.data.select("a", "b")
    assert(df.schema("a").dataType.typeName == "long")
    assert(df.collect().toSeq == Seq(Row(1L, "x"), Row(2L, "y")))
  }

  test("json columns orient: object-of-objects pivoted like pandas") {
    val dir = tmpDir("json2")
    val p = writeFile(dir, "cols.json",
      """{"a": {"0": 1, "1": 2}, "b": {"0": "x", "1": "y"}}""")
    val a = AnyFile.parse(spark, p).head
    val df = a.data.select("a", "b")
    assert(df.collect().toSeq == Seq(Row(1L, "x"), Row(2L, "y")))
  }

  test("invalid json → Failed answer, no exception") {
    val dir = tmpDir("json3")
    val p = writeFile(dir, "broken.json", "{invalid")
    assert(AnyFile.parse(spark, p).head.parseInfo == "Failed")
  }

  test("parquet round-trip preserves native schema (A7)") {
    import spark.implicits._
    val dir = tmpDir("pq")
    val p = dir.resolve("t.parquet").toString
    val src = Seq((1L, 1.5, "s", Array(0.1f, 0.2f))).toDF("l", "d", "s", "arr")
    src.coalesce(1).write.mode("overwrite").parquet(p)
    // Spark writes a directory; AnyFile hands the path to spark.read.parquet
    val a = AnyFile.parse(spark, p).head
    assert(a.sheetName == "Parquet file content")
    assert(a.data.schema("l").dataType.typeName == "long")
    assert(a.data.schema("arr").dataType.typeName == "array")
    assert(a.data.count() == 1)
  }

  test("ParserAnswer derives parseInfo from emptiness, caller value ignored") {
    import spark.implicits._
    val nonEmpty = ParserAnswer(Seq(1).toDF("x"), "/tmp/f")
    assert(nonEmpty.parseInfo == "OK")
    val empty = ParserAnswer(spark.emptyDataFrame, "/tmp/f")
    assert(empty.parseInfo == "Failed")
  }

  test("toString renders the reference block shape") {
    import spark.implicits._
    val a = ParserAnswer(Seq(("x", "y")).toDF("0", "1"), "/tmp/f.txt",
      sheetName = "Text file content", engine = "ImportText",
      knownRowCount = Some(1))
    val s = a.toString
    assert(s.contains("Used engine:    ImportText"))
    assert(s.contains("Parsed columns: 2"))
    assert(s.contains("Parsed rows:    1"))
    assert(s.contains("Status:         OK"))
  }
}
