package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 optimization laws.
  *
  * q139's cumulative vocabulary-mass threshold was re-expressed from ONE
  * global unpartitioned window over the vocabulary into the group-
  * decomposed two-phase form (per-tf-group offsets + in-group rank for
  * the straddling group). This spec pins the NEW query output against
  * the OLD single-window formulation — replicated verbatim below as the
  * reference — on corpora built to hit every branch: whole groups kept,
  * whole groups dropped, the threshold landing strictly INSIDE a group
  * (the `keptBnd` shard-rank path), the threshold landing exactly ON a
  * group edge (keep_k = 0 for the next group), and single-group corpora.
  */
class Round16LawsSpec extends SparkSpec {
  import spark.implicits._

  /** Write a documents.parquet with the given (source, text) rows. */
  private def writeDocs(rows: Seq[(String, String)]): String = {
    val dir = tmpDir("q139law").toString
    rows.zipWithIndex
      .map { case ((src, text), i) => (i.toLong, src, text) }
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The PRE-r16 q139 implementation — the global-window cumulative sum —
    * kept here as the reference semantics. */
  private def reference(dir: String): DataFrame = {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), explode(split(col("text"), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val counts = toks.groupBy("token").agg(count(lit(1)).as("tf"))
    val total = counts.agg(sum(col("tf")).as("total"))
    val w = Window.orderBy(col("tf").desc, col("token"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = counts
      .withColumn("cum", sum(col("tf")).over(w))
      .crossJoin(broadcast(total))
      .filter((col("cum") - col("tf")) * 100 < col("total") * 80)
      .select("token")
    val vocabSize = kept.agg(count(lit(1)).as("vocab_size"))
    val perSource = toks.groupBy("source").agg(count(lit(1)).as("total_tokens"))
    val oov = toks.join(broadcast(kept), Seq("token"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("oov_tokens"))
    perSource.join(oov, Seq("source"), "left")
      .na.fill(0L, Seq("oov_tokens"))
      .crossJoin(broadcast(vocabSize))
      .select(col("source"), col("total_tokens"), col("oov_tokens"),
        expr("oov_tokens * 10000 div total_tokens").as("oov_bp"),
        col("vocab_size"))
      .orderBy("source")
  }

  private def check(rows: Seq[(String, String)]): Unit = {
    val dir = writeDocs(rows)
    val got = SparkEntry.queries("q139_vocab_coverage")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val exp = reference(dir).collect().map(_.toSeq).toSeq
    assert(got == exp, s"q139 decomposition diverged on $rows")
  }

  test("q139: threshold strictly inside a tied-tf group (shard-rank path)") {
    // 10 distinct tokens, each tf = 5 → total 50, threshold mass 40:
    // kept = first 8 tokens by token order of ONE group — keep_k = 8,
    // 0 < keep_k < cnt, tokens spread over several first-char shards.
    val toks = Seq("alpha", "apex", "bravo", "beta", "czar", "delta",
      "echo", "ember", "fox", "golf")
    val text = (1 to 5).flatMap(_ => toks).mkString(" ")
    check(Seq(("s1", text)))
  }

  test("q139: threshold exactly on a group edge (keep_k = 0 next group)") {
    // one token tf=80, twenty tf=1 → cum_before of the first singleton is
    // exactly 80% of 100: the whole singleton group must be dropped.
    val text = ((1 to 80).map(_ => "hot") ++ (1 to 20).map(i => f"u$i%02d"))
      .mkString(" ")
    check(Seq(("s1", text), ("s2", "hot hot u01")))
  }

  test("q139: all-singleton vocabulary (boundary inside the tf=1 group)") {
    val text = (1 to 37).map(i => f"w$i%02d").mkString(" ")
    check(Seq(("a", text), ("b", (1 to 7).map(i => f"w$i%02d").mkString(" "))))
  }

  test("q139: single repeated token (one full group)") {
    check(Seq(("only", "x x x x x x")))
  }

  test("hllRegisters long lane ≡ hex lane: bucket/w from md5_prefix64") {
    // q18/q98's register build now derives (bucket, w) by bit ops on ONE
    // md5_prefix64 digest instead of conv(substring(md5-hex)); this pins
    // the bit-identity on random keys, including multi-byte UTF-8.
    val keys = (1 to 200).map(i => s"key-$i") ++
      Seq("", " ", "üñïçødé-✓", "0", "-1", "")
    val df = keys.toDF("k")
    val hex = md5(col("k"))
    val viaHex = df.select(
      col("k"),
      conv(substring(hex, 1, 2), 16, 10).cast("int").as("bucket"),
      conv(substring(hex, 3, 14), 16, 10).cast("bigint").as("w"))
    val h = graft.functions.GraftFunctions.md5_prefix64(col("k"))
    val viaLong = df.select(col("k"), h.as("h"))
      .select(
        col("k"),
        expr("shiftrightunsigned(h, 56)").cast("int").as("bucket"),
        expr(s"h & ${(1L << 56) - 1}").as("w"))
    val a = viaHex.orderBy("k").collect().map(_.toSeq).toSeq
    val b = viaLong.orderBy("k").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("q139: zipf-ish random corpora, several seeds") {
    val rnd = new scala.util.Random(421)
    (1 to 3).foreach { _ =>
      val vocab = (1 to 40).map(i => s"t$i")
      val docs = (1 to 6).map { d =>
        val n = 30 + rnd.nextInt(40)
        val words = (1 to n).map { _ =>
          // skewed pick: low indexes far more likely
          val i = math.min((math.pow(rnd.nextDouble(), 2.5) * vocab.size).toInt,
            vocab.size - 1)
          vocab(i)
        }
        (s"src${d % 3}", words.mkString(" "))
      }
      check(docs)
    }
  }
}
