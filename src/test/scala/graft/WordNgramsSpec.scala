package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.word_ngrams

/** The custom Generator (UDTF surface): bit-parity with the explode-based
  * composition, codegen integration, SQL registration, and edge semantics. */
class WordNgramsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def composed(n: Int) = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .select(col("doc_id"),
        explode(sequence(lit(1), greatest(size(col("w")) - (n - 1), lit(1))))
          .as("i"),
        col("w"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), col("i"), lit(n))).as("sh"))
  }

  test("word_ngrams matches the split+slice+concat_ws composition exactly") {
    for (n <- Seq(2, 5, 8)) {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val gen = docs.select(col("doc_id"), word_ngrams(col("text"), n).as("sh"))
      // same multiset of rows (order within a doc is also identical, but
      // exceptAll is already a full multiset equality check both ways)
      assert(gen.exceptAll(composed(n)).isEmpty)
      assert(composed(n).exceptAll(gen).isEmpty)
    }
  }

  test("word_ngrams stays inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = docs.select(word_ngrams(col("text"), 5).as("sh"))
      .queryExecution.executedPlan
    // GenerateExec must be wrapped by WholeStageCodegen (codeGenIterableOnce
    // path), not left as a standalone interpreted node
    val inWscg = plan.collect { case w: WholeStageCodegenExec => w }
      .exists(_.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }.nonEmpty)
    assert(inWscg, s"GenerateExec not codegen'd:\n$plan")
  }

  test("word_ngrams is SQL-registered and lateral-view capable") {
    graft.functions.GraftFunctions.registerAll(spark)
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("d")
    val viaSql = spark.sql(
      "SELECT doc_id, sh FROM d LATERAL VIEW word_ngrams(text, 5) t AS sh")
    assert(viaSql.count() ==
      composed(5).count())
  }

  test("byte-level tokenizer matches String.split(\"\\\\s+\", -1) on edge cases") {
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq("", " ", "  ", "a", " a", "a ", " a ", "a  b", "a\tb\nc",
      "a\fb", "多字 节 测试", "tab\t\ttab", "x \r\n y", "éé  øø  平仮名")
    for (s <- cases; n <- Seq(1, 2, 3)) {
      val w = s.split("\\s+", -1)
      val count = math.max(w.length - n + 1, 1)
      val expected = (0 until count).map { i =>
        w.slice(i, math.min(i + n, w.length)).mkString(" ")
      }
      val got = graft.functions.WordNgrams
        .ngrams(UTF8String.fromString(s), n)
        .map(_.getUTF8String(0).toString).toSeq
      assert(got == expected, s"text=${s.replace("\n", "\\n")} n=$n")
    }
  }

  test("short documents emit one truncated shingle; null text emits none") {
    import spark.implicits._
    val df = Seq((1L, "only three words"), (2L, null: String))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"), word_ngrams(col("text"), 5).as("sh"))
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getString(1) == "only three words")
  }
}
