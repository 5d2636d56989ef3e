package graft

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime

import graft.queries.ScaleQueries
import graft.streaming.StreamingCountMin
import graft.streaming.StreamingCountMin.CellInc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming count-min sketch: the documents table split into two
  * micro-batches; per-cell counters accumulated in `flatMapGroupsWithState`
  * state must land EXACTLY on the batch sketch built by q63's cell stream
  * (a mergeable sketch's streaming form and batch form are the same
  * arithmetic), and the state never exceeds depth × width cells. */
class StreamingCountMinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed counters equal the batch sketch; state stays sketch-sized") {
    runSketchStream(spark)
  }

  test("same result under the RocksDB state store (the 100 TB backend)") {
    // Production streaming state at scale lives off-heap in RocksDB, not
    // in the default in-memory HDFS-backed store; pin that the sketch
    // behaves identically under it.
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    runSketchStream(s)
  }

  private def runSketchStream(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val split = ids(ids.length / 2)

    def cells(cond: org.apache.spark.sql.Column) =
      ScaleQueries.cmCells(docs.filter(cond))
        .select(col("r").cast("int").as("r"), col("bucket"), lit(1L).as("n"))

    // stage two parquet files; the file source orders by modification time
    val dir = tmpDir("cm_stream")
    def stage(name: String, cond: org.apache.spark.sql.Column, mtime: Long): Unit = {
      val tmp = tmpDir("cm_stage")
      cells(cond).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
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
      .schema(cells(lit(true)).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .as[CellInc]
    val q = StreamingCountMin.counters(stream)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("cm_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    // counters only grow, so the latest value of each touched cell is its max
    val streamed = spark.table("cm_stream")
      .groupBy("r", "bucket").agg(max(col("cnt")).as("cnt"))
    val batch = ScaleQueries.cmCells(docs)
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)

    // fixed-size state: never more cells than depth x width
    assert(streamed.count() <= 4L * 1024L)
  }
}
