package graft

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime

import graft.streaming.StreamingIntervalJoin
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join: clicks and purchases from the events table
  * fed as two file-source streams; the joined stream must equal q81's
  * batch twin. Inner matches emit as rows arrive; LEFT OUTER null rows for
  * unmatched clicks emit only after the watermark proves no purchase can
  * still match — advanced here by sentinel batches, exactly how a real
  * pipeline's stragglers resolve. */
class StreamingIntervalJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val SentinelUser = -999L

  // events.ts is parquet TIMESTAMP(NANOS) — must go through Tables.events
  // (nanosAsLong + µs conversion), like every query does
  private def eventsDf: DataFrame = graft.queries.Tables.events(spark, sf)

  private def clicksDf: DataFrame =
    eventsDf.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"), col("user_id"),
        col("ts").as("c_ts"))

  private def purchasesDf: DataFrame =
    eventsDf.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"),
        col("user_id").as("p_user_id"), col("ts").as("p_ts"), col("value"))

  /** Stage `frames` as one parquet file each (mtime-ordered: the file
    * source triggers them as successive micro-batches). */
  private def stage(dirName: String, frames: Seq[DataFrame]): java.nio.file.Path = {
    val dir = tmpDir(dirName)
    frames.zipWithIndex.foreach { case (df, i) =>
      val tmp = tmpDir(s"${dirName}_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      val dst = dir.resolve(f"batch$i%02d.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(System.currentTimeMillis() - 60000 + i * 10000))
    }
    dir
  }

  /** q81's output projection over the raw joined columns. */
  private def project(df: DataFrame): DataFrame =
    df.select(
      col("c_event_id"), col("user_id"),
      coalesce(col("p_event_id"), lit(-1L)).as("p_event_id"),
      coalesce(unix_micros(col("p_ts")) - unix_micros(col("c_ts")),
        lit(-1L)).as("gap_us"),
      coalesce(col("value"), lit(0.0)).as("purchase_value"))

  private def runStream(joinType: String, sentinels: Int): Set[Row5] = {
    import spark.implicits._
    val maxTs = eventsDf.agg(max(col("ts"))).collect().head.getTimestamp(0)
    def sentinelAt(days: Int, idBase: Long) = {
      val ts = new java.sql.Timestamp(maxTs.getTime + days * 86400000L)
      (idBase, ts)
    }
    val cFrames = clicksDf +: (1 to sentinels).map { i =>
      val (id, ts) = sentinelAt(2 * i, -1000L - i)
      Seq((id, SentinelUser, ts)).toDF("c_event_id", "user_id", "c_ts")
    }
    val pFrames = purchasesDf +: (1 to sentinels).map { i =>
      val (id, ts) = sentinelAt(2 * i, -2000L - i)
      Seq((id, SentinelUser, ts, 0.0))
        .toDF("p_event_id", "p_user_id", "p_ts", "value")
    }
    val cDir = stage(s"ssj_clicks_$joinType", cFrames)
    val pDir = stage(s"ssj_purch_$joinType", pFrames)

    val cStream = spark.readStream.schema(clicksDf.schema)
      .option("maxFilesPerTrigger", "1").parquet(cDir.toString)
    val pStream = spark.readStream.schema(purchasesDf.schema)
      .option("maxFilesPerTrigger", "1").parquet(pDir.toString)

    val name = s"ssj_out_$joinType"
    val q = StreamingIntervalJoin
      .enrich(cStream, pStream, joinType = joinType)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    project(spark.table(name))
      .filter(col("user_id") =!= SentinelUser)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
  }

  private type Row5 = (Long, Long, Long, Long, Double)

  private def batchTwin(joinType: String): Set[Row5] =
    project(clicksDf.join(purchasesDf,
        col("user_id") === col("p_user_id") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        joinType))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet

  test("inner stream-stream interval join equals the batch join") {
    val streamed = runStream("inner", sentinels = 0)
    val batch = batchTwin("inner")
    assert(streamed == batch,
      s"stream ${streamed.size} rows vs batch ${batch.size}")
    assert(batch.nonEmpty, "batch twin should attribute at least one purchase")
  }

  test("left-outer join: unmatched clicks emit after watermark expiry " +
      "and the full result equals the batch twin (= q81)") {
    // Two sentinel batches: the first advances each source's max event
    // time, the second runs with the watermark COMPUTED from the first
    // (watermarks take effect one batch later), expiring every real
    // click's join window so its outer null row emits.
    val streamed = runStream("left_outer", sentinels = 2)
    val batch = batchTwin("left_outer")
    assert(streamed == batch,
      s"stream ${streamed.size} rows vs batch ${batch.size}")
    // and the batch twin is exactly what q81 declares
    val q81 = graft.queries.RelationalQueries.q81.spark(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
    assert(q81 == batch, "q81 and the spec's batch twin diverge")
  }
}
