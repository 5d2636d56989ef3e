package graft

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime

import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.{BandedDoc, NearDupHit}
import org.apache.spark.sql.streaming.Trigger

/** Streaming MinHash-LSH near-dup: real signatures (md5-derived MinHash
  * over 5-word shingles) for sf0.001 documents, streamed as two
  * micro-batches split by doc_id. The full output must equal a
  * from-scratch batch twin replaying the same arrival order, cap, and
  * threshold — and at least one emitted pair must SPAN the batch
  * boundary, proving bucket state survives micro-batches.
  */
class StreamingNearDupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val Perms = 64
  private val Bands = 16
  private val RowsPerBand = 4
  private val Cap = 16
  private val MinMatches = 32

  private def md5long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  private def signature(text: String): Seq[Long] = {
    val w = text.split("\\s+").filter(_.nonEmpty)
    val shingles = (0 until math.max(w.length - 4, 1))
      .map(i => w.slice(i, i + 5).mkString(" ")).distinct
    (0 until Perms).map { p =>
      shingles.map(sh => md5long(s"$p:$sh")).min
    }
  }

  private def banded(id: Long, sig: Seq[Long]): Seq[BandedDoc] =
    (0 until Bands).map { b =>
      val bh = md5long(s"$b:" + sig.slice(b * RowsPerBand, (b + 1) * RowsPerBand)
        .mkString(","))
      BandedDoc(id, b, bh, sig)
    }

  test("stream equals the batch twin and state crosses micro-batches") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val sigs = docs.map { case (id, text) => id -> signature(text) }
    val rows = sigs.flatMap { case (id, sig) => banded(id, sig) }

    // batch twin: same arrival order (doc_id asc), same cap & threshold
    val expect = scala.collection.mutable.Set.empty[(Long, Long, Int, Int)]
    val buckets = scala.collection.mutable.Map.empty[(Int, Long), List[(Long, Seq[Long])]]
    rows.sortBy(r => (r.doc_id, r.band)).foreach { r =>
      val key = (r.band, r.bh)
      val held = buckets.getOrElse(key, Nil)
      held.foreach { case (oid, osig) =>
        val m = osig.zip(r.sig).count { case (a, b) => a == b }
        if (m >= MinMatches) expect += ((r.doc_id, oid, r.band, m))
      }
      if (held.lengthCompare(Cap) < 0)
        buckets(key) = held :+ (r.doc_id, r.sig)
    }

    // stage two micro-batches split at the median doc_id
    val split = docs(docs.length / 2)._1
    val dir = tmpDir("neardup_stream")
    def stage(name: String, pred: BandedDoc => Boolean, mtime: Long): Unit = {
      val tmp = tmpDir("stage_nd")
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
    stage("batch0.parquet", _.doc_id < split, now - 60000)
    stage("batch1.parquet", _.doc_id >= split, now - 30000)

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[BandedDoc]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .as[BandedDoc]
    val q = StreamingNearDup.probe(stream, Cap, MinMatches)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("neardup_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("neardup_stream").as[NearDupHit].collect()
      .map(h => (h.doc_new, h.doc_old, h.band, h.matches)).toSet
    assert(got == expect.toSet)
    assert(got.nonEmpty, "corpus has exact dups — some pair must fire")
    // state must survive the batch boundary: a pair with the old doc in
    // batch 0 and the new one in batch 1
    assert(got.exists { case (nw, old, _, _) => old < split && nw >= split },
      s"no cross-batch pair (split=$split)")
    // every hit at least meets the threshold; exact twins agree everywhere
    assert(got.forall(_._4 >= MinMatches))
    val texts = docs.toMap
    got.filter { case (nw, old, _, _) => texts(nw) == texts(old) }
      .foreach { case (_, _, _, m) => assert(m == Perms) }
  }
}
