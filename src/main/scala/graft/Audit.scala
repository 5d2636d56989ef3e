package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit measurements that are cheaper to RUN than to argue about —
  * prints one JSON line per audit. Currently: the q94 ball-cover
  * pruning-power audit (candidate pairs the triangle/residual bounds
  * admit vs all-pairs, plus the exact survivor count) — the number the
  * round-5 verdict asked to measure rather than guess.
  *
  *   sbt "runMain graft.Audit <sfDir>"
  */
object Audit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.queries.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val allPairs = n * (n - 1) / 2
    val cand = graft.queries.SimilarityQueries
      .ballCoverCandidates(emb, 0.4).count()
    val survivors = graft.queries.SimilarityQueries
      .ballCover(emb, 0.4).count()
    println(
      s"""{"audit":"ballcover","sf":"$sfDir","n":$n,"all_pairs":$allPairs,""" +
        s""""candidates":$cand,"survivors":$survivors,""" +
        f""""candidate_frac":${cand.toDouble / allPairs}%.4f}""")
    spark.stop()
  }
}
