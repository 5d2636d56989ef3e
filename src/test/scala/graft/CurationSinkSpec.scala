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

  test("corpus ingestion: stream → parse → gate → sink, exactly once across restarts") {
    val in = tmpDir("ingest_in")
    val out = tmpDir("ingest_out").toString + "/docs"
    val ckpt = tmpDir("ingest_ckpt").toString

    def sinkDocs(): Seq[(String, String)] =
      spark.read.parquet(out).collect()
        .map(r => (graft.sources.FsIO.fileName(r.getAs[String]("path")),
          r.getAs[String]("text"))).sortBy(_._1).toSeq
    def rejects(): Seq[(String, String)] =
      spark.read.parquet(out + "_rejects").collect()
        .map(r => (graft.sources.FsIO.fileName(r.getAs[String]("path")),
          r.getAs[String]("reject_reason"))).sortBy(_._1).toSeq

    // drop 1: two good files + one corrupt workbook
    writeFile(in, "a.txt", "x\ty\n1\t2\n")
    writeFile(in, "b.csv", "p|q\n3|4\n")
    writeFile(in, "broken.xlsx", "not a zip")
    CurationSink.ingest(spark, in.toString, out, ckpt)

    assert(sinkDocs() == Seq(
      ("a.txt", "x\ty\n1\t2"), ("b.csv", "p\tq\n3\t4")))
    assert(rejects() == Seq(("broken.xlsx", "parse_failed")))

    // restart, no new arrivals: nothing re-parsed, nothing duplicated
    CurationSink.ingest(spark, in.toString, out, ckpt)
    assert(sinkDocs().size == 2 && rejects().size == 1)

    // drop 2: one good arrival + one that fails the sparse-cell gate
    writeFile(in, "c.txt", "k\tv\n5\t6\n")
    writeFile(in, "holes.csv", "a|||\n|||\n")
    CurationSink.ingest(spark, in.toString, out, ckpt)

    // corpus-grain exactly-once: every arrival accounted for exactly once
    // across all batches — parsed docs in the sink, discards in rejects
    assert(sinkDocs() == Seq(
      ("a.txt", "x\ty\n1\t2"), ("b.csv", "p\tq\n3\t4"),
      ("c.txt", "k\tv\n5\t6")))
    assert(rejects() == Seq(
      ("broken.xlsx", "parse_failed"), ("holes.csv", "sparse_cells")))

    // and a third restart with the same checkpoint is a no-op
    CurationSink.ingest(spark, in.toString, out, ckpt)
    assert(sinkDocs().size == 3 && rejects().size == 2)
  }
}
