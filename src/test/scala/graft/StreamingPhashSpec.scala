package graft

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaCodec
import graft.streaming.StreamingPhashDedup
import graft.streaming.StreamingPhashDedup.{BandedImage, PhashHit}
import org.apache.spark.sql.streaming.Trigger

/** Streaming image perceptual-hash near-dup: real dHash signatures from
  * sf0.001's container fixture (base images + the q173 dither twins),
  * streamed as two micro-batches split by img_id. The full output must
  * equal a from-scratch batch twin replaying the same arrival order, cap
  * and radius — and at least one emitted pair must SPAN the batch
  * boundary (an original in batch 0, its twin in batch 1), proving
  * bucket state survives micro-batches. Planted twins must be found.
  */
class StreamingPhashSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val Cap = 256
  private val MaxHamming = 3

  test("stream equals the batch twin; planted twins found across micro-batches") {
    import spark.implicits._
    // the q173 catalog: base image hashes + dither twins of every 5th
    val sigs: Array[(Long, Array[Int])] =
      Multimodal.containerTable(spark, sf).collect().flatMap { r =>
        val base = MediaCodec.dhashBands(r.payload).map(r.doc_id -> _)
        val twin =
          if (r.doc_id % 5 == 0)
            MediaCodec.dhashBands(r.payload, dither = true)
              .map((r.doc_id + 10000000L) -> _)
          else None
        base.iterator ++ twin.iterator
      }.sortBy(_._1)
    val rows: Array[BandedImage] =
      sigs.flatMap { case (id, b) => StreamingPhashDedup.banded(id, b) }

    // batch twin: same arrival order (img_id asc per bucket), cap, radius
    val expect = scala.collection.mutable.Set.empty[(Long, Long, Int, Int)]
    val buckets =
      scala.collection.mutable.Map.empty[(Int, Int), List[(Long, Array[Int])]]
    def ham(a: Array[Int], b: Array[Int]): Int =
      (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum
    rows.sortBy(r => (r.img_id, r.band)).foreach { r =>
      val key = (r.band, r.bv)
      val sig = Array(r.b0, r.b1, r.b2, r.b3)
      val held = buckets.getOrElse(key, Nil)
      held.foreach { case (oid, osig) =>
        val h = ham(osig, sig)
        if (h <= MaxHamming) expect += ((r.img_id, oid, r.band, h))
      }
      if (held.lengthCompare(Cap) < 0) buckets(key) = held :+ (r.img_id -> sig)
    }

    // stage two micro-batches split at the median BASE img_id — all the
    // dither twins (ids ≥ 1e7) land in batch 1, their originals split
    val split = sigs(sigs.length / 4)._1
    val dir = tmpDir("phash_stream")
    def stage(name: String, pred: BandedImage => Boolean, mtime: Long): Unit = {
      val tmp = tmpDir("stage_ph")
      rows.filter(pred).toSeq.toDS().coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      Files.move(part, dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dir.resolve(name), FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    stage("batch0.parquet", _.img_id < split, now - 60000)
    stage("batch1.parquet", _.img_id >= split, now - 30000)

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[BandedImage]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .as[BandedImage]
    val q = StreamingPhashDedup.probe(stream, Cap, MaxHamming)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("phash_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("phash_stream").as[PhashHit].collect()
      .map(h => (h.img_new, h.img_old, h.band, h.hamming)).toSet
    assert(got == expect.toSet, s"stream ${got.size} vs batch ${expect.size}")
    assert(got.nonEmpty, "the fixture plants near-dup twins — some must fire")
    // per-pair view must contain planted (original, twin) pairs
    val pairs = got.map { case (nw, old, _, _) => (old, nw) }
    assert(pairs.exists { case (old, nw) => nw == old + 10000000L },
      "no planted twin pair surfaced")
    // state must survive the batch boundary
    assert(got.exists { case (nw, old, _, _) => old < split && nw >= split },
      s"no cross-batch pair (split=$split)")
    assert(got.forall(_._4 <= MaxHamming))
  }

  test("audio fingerprints ride the SAME probe: stream equals batch replay") {
    import spark.implicits._
    // the operator is signature-agnostic — any 64-bit banded signature
    // source composes with the (band, value)-keyed state machine. Feed
    // it the q174 audio catalog (base fingerprints + gain+dither twins).
    val sigs: Array[(Long, Array[Int])] =
      Multimodal.containerTable(spark, sf).collect().flatMap { r =>
        val base = MediaCodec.audioBands(r.payload).map(r.doc_id -> _)
        val twin =
          if (r.doc_id % 3 == 0)
            MediaCodec.audioBands(r.payload, dither = true)
              .map((r.doc_id + 10000000L) -> _)
          else None
        base.iterator ++ twin.iterator
      }.sortBy(_._1)
    val rows: Array[BandedImage] =
      sigs.flatMap { case (id, b) => StreamingPhashDedup.banded(id, b) }

    val expect = scala.collection.mutable.Set.empty[(Long, Long, Int, Int)]
    val buckets =
      scala.collection.mutable.Map.empty[(Int, Int), List[(Long, Array[Int])]]
    def ham(a: Array[Int], b: Array[Int]): Int =
      (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum
    rows.sortBy(r => (r.img_id, r.band)).foreach { r =>
      val key = (r.band, r.bv)
      val sig = Array(r.b0, r.b1, r.b2, r.b3)
      val held = buckets.getOrElse(key, Nil)
      held.foreach { case (oid, osig) =>
        val h = ham(osig, sig)
        if (h <= MaxHamming) expect += ((r.img_id, oid, r.band, h))
      }
      if (held.lengthCompare(Cap) < 0) buckets(key) = held :+ (r.img_id -> sig)
    }

    val dir = tmpDir("audio_stream")
    rows.toSeq.toDS().coalesce(1)
      .write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[BandedImage]].schema)
      .parquet(dir.toString)
      .as[BandedImage]
    val q = StreamingPhashDedup.probe(stream, Cap, MaxHamming)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("audio_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("audio_stream").as[PhashHit].collect()
      .map(h => (h.img_new, h.img_old, h.band, h.hamming)).toSet
    assert(got == expect.toSet, s"stream ${got.size} vs batch ${expect.size}")
    val pairs = got.map { case (nw, old, _, _) => (old, nw) }
    assert(pairs.exists { case (old, nw) => nw == old + 10000000L },
      "no planted audio twin pair surfaced")
  }
}
