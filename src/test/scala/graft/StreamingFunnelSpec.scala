package graft

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime
import java.sql.Timestamp

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{FEvent, Fixed, Pend, StepHit}

/** Stateful streaming funnel: steps finalize only when the watermark
  * passes their minimum candidate; out-of-order events may lower a
  * pending minimum but never a fixed one; state compacts against the
  * watermark lower bounds. */
class StreamingFunnelSpec extends SparkSpec {

  private val U = StreamingFunnel.Unset
  private val T0 = 1700000000000L
  private def ts(offsetMin: Long) = new Timestamp(T0 + offsetMin * 60000L)
  private def ms(offsetMin: Long) = T0 + offsetMin * 60000L

  // ---- pure advance ----

  test("advance fixes a full funnel once the watermark passes it") {
    val pend = Seq(Pend(ms(0), 0), Pend(ms(10), 1), Pend(ms(20), 2))
    val (fixed, kept, hits) =
      StreamingFunnel.advance(Fixed(U, U, U), pend, ms(21))
    assert(fixed == Fixed(ms(0), ms(10), ms(20)))
    assert(hits.map(h => (h.step, h.ts_ms)) ==
      Seq((1, ms(0)), (2, ms(10)), (3, ms(20))))
    assert(kept.isEmpty) // all stages resolved: nothing pending
  }

  test("advance holds a step whose candidate the watermark has not passed") {
    val pend = Seq(Pend(ms(0), 0), Pend(ms(10), 1))
    val (fixed, kept, hits) =
      StreamingFunnel.advance(Fixed(U, U, U), pend, ms(5))
    assert(fixed == Fixed(ms(0), U, U)) // t1 final, click still pending
    assert(hits.map(_.step) == Seq(1))
    assert(kept == Seq(Pend(ms(10), 1)))
  }

  test("advance: a pending minimum can drop before fixing, never after") {
    // view@8 pending, wm=5 -> t1 unfixed; late view@6 (>= wm, legal) lowers it
    val (f1, kept1, h1) = StreamingFunnel.advance(
      Fixed(U, U, U), Seq(Pend(ms(8), 0)), ms(5))
    assert(f1.t1 == U && h1.isEmpty)
    val (f2, _, h2) = StreamingFunnel.advance(
      f1, kept1 :+ Pend(ms(6), 0), ms(7))
    assert(f2.t1 == ms(6) && h2.map(_.ts_ms) == Seq(ms(6)))
  }

  test("advance compaction: useless clicks and purchases are dropped") {
    // t1 fixed at 10: clicks <= 10 can never be step 2
    val pend = Seq(Pend(ms(5), 1), Pend(ms(10), 1), Pend(ms(15), 1),
      Pend(ms(3), 2))
    val (_, kept, _) =
      StreamingFunnel.advance(Fixed(ms(10), U, U), pend, ms(12))
    assert(kept.filter(_.kind == 1) == Seq(Pend(ms(15), 1)))
    // purchase@3 <= lb(t2) (t2 will be > t1 = 10): dropped
    assert(!kept.exists(_.kind == 2))
  }

  test("advance compaction: views compact to their minimum") {
    val pend = Seq(Pend(ms(9), 0), Pend(ms(4), 0), Pend(ms(7), 0))
    val (_, kept, _) =
      StreamingFunnel.advance(Fixed(U, U, U), pend, ms(2))
    assert(kept == Seq(Pend(ms(4), 0)))
  }

  test("advance: no-view clicks below the watermark can never qualify") {
    // any future view arrives with ts >= wm, so t1 >= wm: click@5 < wm=30 dies
    val (_, kept, _) = StreamingFunnel.advance(
      Fixed(U, U, U), Seq(Pend(ms(5), 1)), ms(30))
    assert(kept.isEmpty)
  }

  test("input-batch compaction (fix threshold -inf) still drops dead no-view clicks") {
    // the state-leak fix: a key with clicks but NO view never has a
    // fixable candidate, so only the compaction watermark can bound its
    // buffer — the split-threshold advance drops clicks ≤ wm while the
    // -inf fix threshold still emits nothing
    val (fixed, kept, hits) = StreamingFunnel.advance(
      Fixed(U, U, U), Seq(Pend(ms(5), 1), Pend(ms(40), 1), Pend(ms(2), 2)),
      Long.MinValue, ms(30))
    assert(hits.isEmpty && fixed == Fixed(U, U, U))
    // click@40 > wm stays (still inside the disorder window); the rest die
    assert(kept == Seq(Pend(ms(40), 1)))
  }

  test("pre-1970 (negative-millis) steps fix once and never re-emit") {
    val neg = -365L * 86400000L // deep in 1969
    val (f1, kept1, h1) = StreamingFunnel.advance(
      Fixed(U, U, U), Seq(Pend(neg, 0)), neg + 10)
    assert(f1.t1 == neg && h1.map(_.step) == Seq(1) && kept1.isEmpty)
    // with a -1 sentinel this step would read "unfixed" (negative ts) and
    // re-emit on every later firing; with Unset it must stay silent
    val (f2, _, h2) = StreamingFunnel.advance(f1, Seq.empty, neg + 1000000)
    assert(f2 == f1 && h2.isEmpty)
  }

  // ---- end-to-end against the batch recompute ----

  test("streamed funnel steps equal the batch funnel on finalized users") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._

    // u1: full in-order funnel; u2: click precedes its only view (click
    // can never follow the view -> step 1 only); u3: late watermark pump
    val batches = Seq(
      Seq(FEvent(1L, ts(0), "view"), FEvent(1L, ts(10), "click"),
        FEvent(1L, ts(20), "purchase"), FEvent(2L, ts(5), "click"),
        // u5 has clicks and never a view: exercises the cleanup-timer
        // path (no fixable candidate, non-empty pending) — must emit
        // nothing and must not wedge the query
        FEvent(5L, ts(1), "click"), FEvent(5L, ts(2), "click")),
      Seq(FEvent(2L, ts(30), "view"), FEvent(1L, ts(15), "click")),
      Seq(FEvent(3L, ts(600), "view"))
    )

    val dir = tmpDir("funnel_stream")
    val now = System.currentTimeMillis()
    batches.zipWithIndex.foreach { case (evs, i) =>
      val tmp = tmpDir("funnel_stage")
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
      .as[FEvent]
    val q = StreamingFunnel.steps(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("funnel_steps")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val got = s.table("funnel_steps").as[StepHit].collect()
      .map(h => (h.user_id, h.step, h.ts_ms)).toSet

    // from-scratch batch funnel over the same events (q93 semantics)
    val all = batches.flatten
    def funnel(u: Long): Seq[(Long, Int, Long)] = {
      val mine = all.filter(_.user_id == u)
      def minAfter(tpe: String, after: Long): Option[Long] = {
        val c = mine.filter(e => e.event_type == tpe && e.ts.getTime > after)
          .map(_.ts.getTime)
        if (c.isEmpty) None else Some(c.min)
      }
      val t1 = minAfter("view", Long.MinValue)
      val t2 = t1.flatMap(minAfter("click", _))
      val t3 = t2.flatMap(minAfter("purchase", _))
      Seq(t1.map((u, 1, _)), t2.map((u, 2, _)), t3.map((u, 3, _))).flatten
    }
    // final watermark passed every step candidate except u3's own view
    val expect = Seq(1L, 2L, 3L, 5L).flatMap(funnel)
      .filter { case (_, _, t) => t < ms(600) - 1000 }.toSet
    assert(got == expect)
    assert(got == Set((1L, 1, ms(0)), (1L, 2, ms(10)), (1L, 3, ms(20)),
      (2L, 1, ms(30))))
    // exactly-once: no (user, step) appears twice
    val keys = s.table("funnel_steps").as[StepHit].collect()
      .map(h => (h.user_id, h.step))
    assert(keys.length == keys.distinct.length)
  }

  test("checkpoint restart: pending state survives, steps emit exactly once across runs") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._

    val in = tmpDir("funnel_restart_in")
    val out = tmpDir("funnel_restart_out").toString
    val ckpt = tmpDir("funnel_restart_ckpt").toString

    def stage(name: String, evs: Seq[FEvent]): Unit = {
      val tmp = tmpDir("funnel_restart_stage")
      evs.toDF().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      Files.move(part, in.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    }
    def run(): Unit = {
      val stream = s.readStream
        .schema(Seq(FEvent(0L, ts(0), "view")).toDF().schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in.toString)
        .withWatermark("ts", "1 second")
        .as[FEvent]
      val q = StreamingFunnel.steps(stream)
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      q.stop()
    }

    // run 1: the funnel's events arrive, but the watermark cannot pass
    // them within this run — everything parks in RocksDB state
    stage("b0.parquet", Seq(FEvent(1L, ts(0), "view"),
      FEvent(1L, ts(10), "click"), FEvent(1L, ts(20), "purchase")))
    run()

    // run 2 is a RESTART from the checkpoint: a later event pumps the
    // watermark; the parked state must still be there and emit
    stage("b1.parquet", Seq(FEvent(9L, ts(600), "view")))
    run()
    val after2 = s.read.parquet(out).as[StepHit].collect()
      .map(h => (h.user_id, h.step, h.ts_ms)).toSet
    assert(after2 == Set((1L, 1, ms(0)), (1L, 2, ms(10)), (1L, 3, ms(20))))

    // run 3: restart with NO new input — nothing may re-emit
    run()
    val after3 = s.read.parquet(out).as[StepHit].collect()
    assert(after3.length == 3, s"replay duplicated steps: ${after3.length}")
  }
}
