package graft

import org.apache.spark.sql.functions._

/** Prefix-filtering guarantees for q76: the prefix index must generate
  * strictly fewer candidates than the naive any-shared-shingle join while
  * losing NO qualifying pair (completeness at a second scale factor; the
  * sf0.01 oracle hash-check proves it at the driver's SF). */
class PpjoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("prefix filter prunes candidates with zero recall loss") {
    val sh3 = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.word_ngrams(col("text"), 3).as("sh"))
      .distinct()
      .select(col("doc_id"), md5(col("sh")).as("h"))
      .localCheckpoint()

    val naiveCand = sh3.as("a").join(sh3.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    val dfreq = sh3.groupBy("h").agg(count(lit(1)).as("df"))
    val sizes = sh3.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ranked = sh3.join(dfreq, "h").join(sizes, "doc_id")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("df"), col("h"))))
    val prefix = ranked.filter(expr("rk <= n - ((6 * n + 9) div 10) + 1"))
      .select("doc_id", "h")
    val prefixCand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    val nNaive = naiveCand.count()
    val nPrefix = prefixCand.count()
    assert(nPrefix < nNaive, s"prefix $nPrefix !< naive $nNaive")

    // completeness: verifying the PREFIX candidates finds exactly the
    // pairs that verifying ALL naive candidates finds
    def verified(cand: org.apache.spark.sql.DataFrame) = cand
      .join(sh3.as("xa"), col("doc_a") === col("xa.doc_id"))
      .join(sh3.as("xb"),
        col("doc_b") === col("xb.doc_id") && col("xa.h") === col("xb.h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(col("inter") * 10 >=
        (col("sa.n") + col("sb.n") - col("inter")) * 6)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(verified(prefixCand) == verified(naiveCand))
  }
}
