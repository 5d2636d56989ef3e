package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries
import graft.streaming.CurationSink

/** Incremental curation via foreachBatch: idempotent per-batch output,
  * restart-without-duplicates, and batch/stream policy equivalence. */
class CurationSinkSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed curation equals batch curation; restart adds nothing") {
    val in = tmpDir("curation_in").toString
    val out = tmpDir("curation_out").toString
    val ckpt = tmpDir("curation_ckpt").toString

    // two corpus drops as separate input files -> separate micro-batches
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.filter(col("doc_id") < 250).coalesce(1)
      .write.mode("append").parquet(in)
    CurationSink.drain(spark, in, out, ckpt)

    val afterFirst = spark.read.parquet(s"$out/batch_id=0")
    assert(afterFirst.count() > 0)

    // restart on the SAME checkpoint with no new input: no new batch dirs,
    // nothing re-emitted
    CurationSink.drain(spark, in, out, ckpt)
    val dirsAfterRerun = Files.list(Paths.get(out)).toArray.length
    assert(dirsAfterRerun == 1, s"replay created spurious output: $dirsAfterRerun")

    // second drop arrives -> exactly one more batch partition
    docs.filter(col("doc_id") >= 250).coalesce(1)
      .write.mode("append").parquet(in)
    CurationSink.drain(spark, in, out, ckpt)
    assert(Files.list(Paths.get(out)).toArray.length == 2)

    // curation policy is a pure function of content, so the streamed total
    // equals the batch run over the same corpus — both drops are dedup-free
    // (doc_ids unique), so within-batch vs global dedup scope cannot differ
    val streamed = spark.read.parquet(s"$out/batch_id=0", s"$out/batch_id=1")
    val batch = PipelineQueries.curate(docs)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
