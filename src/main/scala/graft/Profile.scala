package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: stage-by-stage counts+timings for the dedup pipelines. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .select(col("doc_id"),
        explode(sequence(lit(1), greatest(size(col("w")) - 4, lit(1)))).as("i"),
        col("w"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), col("i"), lit(5))).as("sh"))
      .distinct()
    timed("shingles count")(println("  n=" + sh.count()))

    val hs = sh.select(col("doc_id"),
      array((0 until 64).map(i => xxhash64(lit(i), col("sh"))): _*).as("hs"))
    import graft.functions.ArrayLongFold.arrayMinAgg
    val sigs = hs.groupBy("doc_id").agg(arrayMinAgg(col("hs")).as("sig")).cache()
    timed("sigs materialize")(println("  n=" + sigs.count()))

    val bands = sigs.select(
      col("doc_id"),
      explode(array((0 until 16).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1)): _*)
            .as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    timed("bands count")(println("  n=" + bands.count()))

    val sizes = bands.groupBy("band", "bh").agg(count(lit(1)).as("bsz"))
    timed("bucket size histogram") {
      sizes.groupBy(
        when(col("bsz") === 1, "1").when(col("bsz") <= 4, "2-4")
          .when(col("bsz") <= 16, "5-16").when(col("bsz") <= 64, "17-64")
          .when(col("bsz") <= 256, "65-256").otherwise(">256").as("bucket_size"))
        .agg(count(lit(1)).as("n_buckets"), sum(col("bsz") * col("bsz")).as("pairs_ub"))
        .orderBy("bucket_size").show(20, false)
    }

    val okBuckets = sizes.filter(col("bsz") <= 64 && col("bsz") > 1)
      .select("band", "bh")
    val bounded = bands.join(broadcast(okBuckets), Seq("band", "bh"))
    val cand = bounded.as("x")
      .join(bounded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    timed("candidates count")(println("  n=" + cand.count()))

    val agreement = (0 until 64).map(i =>
      when(element_at(col("sa.sig"), i + 1) === element_at(col("sb.sig"), i + 1), 1)
        .otherwise(0)).reduce(_ + _)
    val est = cand
      .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sigs.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (agreement.cast("double") / 64).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
    timed("est+filter count")(println("  n=" + est.count()))

    spark.stop()
  }
}
