package graft

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime

import graft.streaming.StreamingHistogram
import graft.streaming.StreamingHistogram.BucketInc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming log-histogram: the documents table split into two
  * micro-batches; per-(lang, bucket) counters in `flatMapGroupsWithState`
  * state must land EXACTLY on the batch histogram q68 builds, the
  * quantiles read off them must equal q68's reported lower bounds, and
  * the state never exceeds groups × 64 cells. */
class StreamingHistogramSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed histogram equals batch; quantiles reproduce q68 exactly") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val split = ids(ids.length / 2)

    // q68's bucketing: bit length of n_chars
    def incs(cond: org.apache.spark.sql.Column) =
      docs.filter(cond).select(
        col("lang").as("group"),
        length(conv(col("n_chars"), 10, 2)).cast("long").as("bucket"),
        lit(1L).as("n"))

    val dir = tmpDir("hist_stream")
    def stage(name: String, cond: org.apache.spark.sql.Column, mtime: Long): Unit = {
      val tmp = tmpDir("hist_stage")
      incs(cond).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      val dst = dir.resolve(name)
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    stage("batch0.parquet", col("doc_id") < split, now - 60000)
    stage("batch1.parquet", col("doc_id") >= split, now - 30000)

    val stream = spark.readStream
      .schema(incs(lit(true)).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .as[BucketInc]
    val q = StreamingHistogram.counters(stream)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("hist_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    // counters only grow → latest value per cell = max
    val streamed = spark.table("hist_stream")
      .groupBy("group", "bucket").agg(max(col("cnt")).as("cnt"))
    val batch = incs(lit(true))
      .groupBy("group", "bucket").agg(count(lit(1)).as("cnt"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)

    // state bound: ≤ groups × 64 cells
    val nGroups = docs.select("lang").distinct().count()
    assert(streamed.count() <= nGroups * 64)

    // quantiles from the streamed counters == q68's batch answers
    val hists = streamed.collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      }
    val q68 = graft.queries.SketchQueries.q68.spark(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    q68.foreach { case (lang, (p50, p90, p99)) =>
      val h = hists(lang)
      assert(StreamingHistogram.quantileLb(h, 50) == p50, s"$lang p50")
      assert(StreamingHistogram.quantileLb(h, 90) == p90, s"$lang p90")
      assert(StreamingHistogram.quantileLb(h, 99) == p99, s"$lang p99")
    }
  }
}
