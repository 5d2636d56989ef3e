package graft

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime
import java.sql.Timestamp

import graft.streaming.StreamingSessions
import graft.streaming.StreamingSessions.SEvent
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Event-time-timer sessionization: sessions must close exactly when the
  * WATERMARK passes last_event + gap — fired by `handleExpiredTimer`, not
  * by the key's next event — and open sessions must stay withheld. */
class StreamingSessionsSpec extends SparkSpec {

  private val T0 = 1700000000000L // fixed epoch anchor, deterministic
  private def ts(offsetMin: Long) = new Timestamp(T0 + offsetMin * 60000L)

  test("watermark-driven timers close idle sessions; open sessions are withheld") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._

    // batch0: user 1 has a 3-event session; user 2 a single event.
    // batch1: user 1 re-appears 3h later (new session; watermark -> ~3h).
    // batch2: user 3 appears even later, advancing the watermark so the
    //         batch1 timers (user1@10:20+30m, user2@10:00+30m) expire.
    val batches = Seq(
      Seq(SEvent(1L, ts(0)), SEvent(1L, ts(10)), SEvent(1L, ts(20)), SEvent(2L, ts(0))),
      Seq(SEvent(1L, ts(180))),
      Seq(SEvent(3L, ts(360)))
    )

    val dir = tmpDir("sess_stream")
    val now = System.currentTimeMillis()
    batches.zipWithIndex.foreach { case (evs, i) =>
      val tmp = tmpDir("sess_stage")
      evs.toDF().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      val dst = dir.resolve(s"batch$i.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(now - 60000 + i * 1000))
    }

    val stream = s.readStream
      .schema(batches.head.toDF().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withWatermark("ts", "1 second")
      .as[SEvent]
    val q = StreamingSessions.sessions(stream, gapMs = 30 * 60000L)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sess_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val out = s.table("sess_out")
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // closed via timer expiry: user1's first session (00:00-00:20), user2's
    // singleton, and — in the trailing no-data batch AvailableNow runs once
    // the final watermark (06:00-1s) passes its 03:30 timer — user1's
    // second session. user3's timer (06:30) is beyond the final watermark,
    // so its session is withheld: open state survives the run.
    assert(out == Set(
      (1L, T0, T0 + 20 * 60000L, 3L),
      (2L, T0, T0, 1L),
      (1L, T0 + 180 * 60000L, T0 + 180 * 60000L, 1L)
    ), s"got $out")
  }

  test("cross-batch late events extend backward or split — never inflate the parked session") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._

    // generous watermark delay so the late events are legal (not dropped):
    // batch0 parks user 4's session at [60, 60]. batch1 delivers two LATE
    // events: 50min (within gap 15 → extends the session BACKWARD... no:
    // 60-50=10 <= 15, merges, start moves to 50) and 10min (disjoint —
    // its own earlier session, closed inline by the sweep since the parked
    // interval follows it beyond the gap). batch2 advances the watermark
    // far enough to flush the merged session too.
    val batches = Seq(
      Seq(SEvent(4L, ts(60))),
      Seq(SEvent(4L, ts(50)), SEvent(4L, ts(10))),
      Seq(SEvent(5L, ts(600)))
    )
    val dir = tmpDir("sess_late")
    val now = System.currentTimeMillis()
    batches.zipWithIndex.foreach { case (evs, i) =>
      val tmp = tmpDir("sess_late_stage")
      evs.toDF().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      val dst = dir.resolve(s"batch$i.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(now - 60000 + i * 1000))
    }

    val stream = s.readStream
      .schema(batches.head.toDF().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withWatermark("ts", "2 hours") // late events stay above the watermark
      .as[SEvent]
    val q = StreamingSessions.sessions(stream, gapMs = 15 * 60000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_late").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val out = s.table("sess_late")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms"),
        r.getAs[Long]("end_ms"), r.getAs[Long]("n_events"))).toSet
    // the disjoint late singleton {10} and the backward-grown [50, 60]
    // session (2 events) both park, then close via timer once batch2's
    // watermark passes their gaps — nothing was emitted prematurely, so
    // the late events could still have merged or split them
    assert(out == Set(
      (4L, T0 + 10 * 60000L, T0 + 10 * 60000L, 1L),
      (4L, T0 + 50 * 60000L, T0 + 60 * 60000L, 2L)
    ), s"got $out")
  }

  test("sweep property: incremental batch folding = one-shot gap sessionization") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.streaming.StreamingSessions.{sweep, SessState}
    val gen = for {
      gap <- Gen.chooseNum(1L, 50L)
      times <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 500L))
      cuts <- Gen.listOf(Gen.chooseNum(0, times.length))
    } yield (gap, times, cuts.sorted)
    val prop = Prop.forAll(gen) { case (gap, times, cuts) =>
      // reference: single-pass gap scan over globally sorted times
      val sorted = times.sorted
      val ref = sorted.tail.foldLeft(
        List(SessState(sorted.head, sorted.head, 1L))) { (acc, t) =>
        if (t - acc.head.lastMs > gap)
          SessState(t, t, 1L) :: acc
        else SessState(acc.head.startMs, t, acc.head.n + 1) :: acc.tail
      }.reverse
      // incremental: arbitrary batch boundaries, sweep folds each batch
      // into the parked intervals exactly as handleInputRows does
      val bounds = (0 +: cuts :+ times.length).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (a, b) => times.slice(a, b) }
      val folded = chunks.foldLeft(Seq.empty[SessState]) { (parked, chunk) =>
        sweep(parked ++ chunk.map(t => SessState(t, t, 1L)), gap)
      }
      folded == ref
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.toString)
  }

  test("gap-split intervals close via the watermark; the open tail is withheld") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._

    // one batch holding TWO sessions for the same user (90min gap): the
    // first parks and closes once the trailing batch's watermark passes
    // its gap; the second stays open (timer beyond the final watermark)
    val evs = Seq(SEvent(9L, ts(0)), SEvent(9L, ts(5)), SEvent(9L, ts(95)))
    val dir = tmpDir("sess_inline")
    evs.toDF().coalesce(1).write.mode("overwrite").parquet(dir.toString)

    val stream = s.readStream.schema(evs.toDF().schema)
      .parquet(dir.toString)
      .withWatermark("ts", "1 second")
      .as[SEvent]
    val q = StreamingSessions.sessions(stream, gapMs = 30 * 60000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_inline").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val out = s.table("sess_inline")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms"),
        r.getAs[Long]("end_ms"), r.getAs[Long]("n_events"))).toSet
    assert(out == Set((9L, T0, T0 + 5 * 60000L, 2L)), s"got $out")
  }
}
