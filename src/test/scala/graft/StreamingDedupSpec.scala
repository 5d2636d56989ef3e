package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.HashedDoc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stateful streaming dedup (`flatMapGroupsWithState`): the documents table
  * split into two micro-batches by doc_id; state must carry seen-hashes
  * across the batch boundary, emitting each content hash exactly once with
  * the deterministic first-batch min-doc_id survivor.
  */
class StreamingDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("first-seen dedup emits each content hash exactly once across batches") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("h"))
      .as[HashedDoc]
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val split = ids(ids.length / 2)

    // stage two parquet files; the file source orders by modification time
    val dir = tmpDir("dedup_stream")
    def stage(name: String, cond: org.apache.spark.sql.Column, mtime: Long): Unit = {
      val tmp = tmpDir("stage")
      docs.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
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
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .as[HashedDoc]
    val q = StreamingDedup.firstSeen(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_stream")

    // exactly-once per content hash
    val dupEmits = got.groupBy("h").count().filter(col("count") > 1).count()
    assert(dupEmits == 0)
    assert(got.count() ==
      docs.select(countDistinct(col("h"))).as[Long].head())

    // deterministic survivor: min doc_id within the EARLIEST batch that
    // carries the hash, plus that batch's occurrence count
    val expected = docs.toDF()
      .withColumn("b", when(col("doc_id") < split, 0).otherwise(1))
      .groupBy("h", "b").agg(min("doc_id").as("doc_id"), count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("h").orderBy("b")))
      .filter(col("rk") === 1)
      .select(col("h"), col("doc_id"), col("n").as("n_in_first_batch"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
