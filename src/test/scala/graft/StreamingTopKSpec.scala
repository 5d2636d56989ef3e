package graft

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime

import graft.functions.TopKByKey
import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.Scored
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `transformWithState` per-key top-k: the orders table split into two
  * micro-batches; heap state carried across the batch boundary must make
  * each key's LATEST leaderboard identical to the batch [[TopKByKey]]
  * aggregate over the full input — the streaming/batch twin property the
  * suite pins for every stateful operator. Runs under RocksDB, the only
  * state store transformWithState supports (and the 100 TB backend).
  */
class StreamingTopKSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming leaderboard converges to the batch top-k aggregate") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._

    val scored = s.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey").as("g"),
        col("o_totalprice").as("key"),
        col("o_orderkey").as("id"))
    val ids = scored.select("id").as[Long].collect().sorted
    val split = ids(ids.length / 2)

    // stage two parquet files; the file source orders by modification time
    val dir = tmpDir("topk_stream")
    def stage(name: String, cond: org.apache.spark.sql.Column, mtime: Long): Unit = {
      val tmp = tmpDir("topk_stage")
      scored.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
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
    stage("batch0.parquet", col("id") < split, now - 60000)
    stage("batch1.parquet", col("id") >= split, now - 30000)

    val stream = s.readStream
      .schema(scored.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .as[Scored]
    val q = StreamingTopK.leaderboard(stream, 3)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("topk_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    // n_seen strictly grows per key, so each key's latest leaderboard is
    // the emission with its maximal n_seen
    val emitted = s.table("topk_stream")
    val latest = emitted
      .withColumn("mx", max(col("n_seen")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .filter(col("n_seen") === col("mx"))
      .select("g", "rk", "key", "id")

    val batch = scored.groupBy(col("g"))
      .agg(TopKByKey.topkByKey(col("key"), col("id"), 3).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rk"),
        col("col.key"), col("col.tie").as("id"))

    val l = latest.collect().toSet
    val b = batch.collect().toSet
    assert(l == b, s"stream/batch divergence: ${(l diff b).take(5)} vs ${(b diff l).take(5)}")
    assert(l.nonEmpty)
  }

  test("state is heap-sized: a hot key's leaderboard still holds exactly k rows") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._

    // one hot key, many events, duplicated keys — the Update-mode output
    // per batch is exactly min(k, seen) rows, ranks 1..k contiguous
    val hot = (0 until 1000).map(i => Scored(7L, (i % 10).toDouble, i.toLong))
    val dir = tmpDir("topk_hot")
    hot.toDF().coalesce(1).write.mode("overwrite").parquet(dir.toString)

    val stream = s.readStream.schema(hot.toDF().schema)
      .parquet(dir.toString).as[Scored]
    val q = StreamingTopK.leaderboard(stream, 4)
      .writeStream.outputMode("update").format("memory")
      .queryName("topk_hot").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val rows = s.table("topk_hot").collect()
    assert(rows.length == 4, rows.mkString(","))
    assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq == Seq(1, 2, 3, 4))
    // best = highest key (9.0), lowest id among the 9.0 events (id 9)
    val top = rows.find(_.getAs[Int]("rk") == 1).get
    assert(top.getAs[Double]("key") == 9.0 && top.getAs[Long]("id") == 9L,
      top.toString)
    assert(rows.forall(_.getAs[Long]("n_seen") == 1000L))
  }
}
