package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming twins of the batch window queries (SURVEY.md §2B
  * streaming row): the same events data driven through readStream →
  * watermark → tumbling/session window → memory sink. The DuckDB oracle
  * can only check the batch forms (q15/q16); this spec proves the streaming
  * path produces consistent aggregates.
  */
class StreamingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val streamDir: String = {
    // file stream sources watch a DIRECTORY; stage the single parquet file
    val d = tmpDir("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("part-0.parquet"))
    d.toString
  }

  private def eventsStream =
    // schema-adaptive decode shared with the batch reader (Tables.events)
    graft.queries.Tables.eventsStream(spark, sf, streamDir)

  test("streaming tumbling window matches batch hourly counts") {
    val agg = eventsStream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("hourly")
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("hour_start"), col("event_type"), col("n_events"))
    val batch = graft.queries.Tables.events(spark, sf)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming session window produces sessions") {
    val agg = eventsStream
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessions")
    assert(sessions.count() > 0)
    // session count per user must match the batch gap-based sessionization
    val streamedPerUser = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"))
    val batchPerUser = graft.queries.RelationalQueries.q16
      .spark(spark, sf)
      .groupBy("user_id").agg(countDistinct(col("session_id")).as("n_sessions"))
    assert(streamedPerUser.exceptAll(batchPerUser).isEmpty)
  }

  test("stream-stream interval join (watermarked both sides) matches batch") {
    // attribution shape: each purchase joined to the same user's clicks in
    // the preceding 30 minutes. Both sides watermarked + a time-range
    // condition — the form Spark requires to bound join state, i.e. the
    // state store holds only the last 30min+watermark of clicks per user
    // instead of the whole stream (the 100 TB concern, solved by the
    // engine when the query is written this way).
    def side(tpe: String, u: String, t: String) = eventsStream
      .filter(col("event_type") === tpe)
      .select(col("user_id").as(u), col("ts").as(t))
    val clicks = side("click", "c_user", "c_ts").withWatermark("c_ts", "1 hour")
    val purchases = side("purchase", "p_user", "p_ts").withWatermark("p_ts", "1 hour")
    val joined = purchases.join(clicks,
      col("c_user") === col("p_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("attributed")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attributed")
      .select("p_user", "p_ts", "c_ts")

    val ev = graft.queries.Tables.events(spark, sf)
    def bSide(tpe: String, u: String, t: String) = ev
      .filter(col("event_type") === tpe)
      .select(col("user_id").as(u), col("ts").as(t))
    val batch = bSide("purchase", "p_user", "p_ts")
      .join(bSide("click", "c_user", "c_ts"),
        col("c_user") === col("p_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"))
      .select("p_user", "p_ts", "c_ts")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-static enrichment join matches the batch twin (q119)") {
    // The q119 topology with a real stream: each micro-batch of events is
    // joined to STATIC dimension tables (broadcast into the batch — no
    // state store, no watermark needed for the join), then aggregated.
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    val agg = eventsStream
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("enriched")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("enriched")
    val batch = graft.queries.RelationalQueries.q119.spark(spark, sf)
      .select("nation", "event_type", "n_events")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
