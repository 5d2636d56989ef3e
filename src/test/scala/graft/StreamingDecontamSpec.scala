package graft

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime

import graft.streaming.StreamingDecontam
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stateless streaming decontamination gate: benchmark Bloom baked into
  * the plan, per-row shingle fold, no state store. Laws:
  *
  *  - stream ≡ batch: the gate over a 2-micro-batch file stream emits
  *    exactly the batch gate's rows (stateless ⇒ trivially so; the test
  *    pins that the fold really is expression-only and append-legal);
  *  - zero false negatives: every document sharing an exact 8-gram with
  *    the benchmark is flagged (Bloom construction — both probe bits of
  *    a benchmark shingle are set);
  *  - short docs (<8 words) have no shingles and never flag.
  */
class StreamingDecontamSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("no false negatives vs the exact 8-gram intersection; batch gate sane") {
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val bloom = StreamingDecontam.buildBloomWords(bench)
    val got = StreamingDecontam.gate(train, bloom)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // exact contaminated set via an 8-gram digest semi-join
    def grams(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      graft.functions.GraftFunctions.word_ngrams(col("text"), 8).as("sh"))
      .select(col("doc_id"), md5(col("sh")).as("h"))
    val exact = grams(train)
      .join(grams(bench).select("h").distinct(), Seq("h"), "left_semi")
      .select("doc_id").distinct().as[Long].collect().toSet

    exact.foreach { id =>
      assert(got(id)._2 > 0L, s"doc $id exactly contaminated but not flagged")
    }
    // shingle counts are the plain positional count
    val lens = train.select(col("doc_id"),
      greatest(size(split(col("text"), "\\s+")) - 7, lit(0)).cast("long"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (id, (nSh, nHits)) =>
      assert(nSh == lens(id)); assert(nHits <= nSh)
    }
    assert(exact.nonEmpty, "fixture degenerate: no exact contamination")
  }

  test("streaming gate over 2 micro-batches ≡ batch gate; <8-word docs never flag") {
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val bloom = StreamingDecontam.buildBloomWords(bench)
    val train = docs.filter(col("doc_id") % 17 =!= 0)
      .unionAll(Seq((100000L, "only seven words live in this doc")).toDF("doc_id", "text"))

    val dir = tmpDir("decontam_stream")
    val ids = train.select("doc_id").as[Long].collect().sorted
    val split_ = ids(ids.length / 2)
    def stage(name: String, cond: org.apache.spark.sql.Column, mtime: Long): Unit = {
      val tmp = tmpDir("stage")
      train.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
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
    stage("b0.parquet", col("doc_id") < split_, now - 60000)
    stage("b1.parquet", col("doc_id") >= split_, now - 30000)

    val stream = spark.readStream.schema(train.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = StreamingDecontam.gate(stream, bloom)
      .writeStream.outputMode("append").format("memory")
      .queryName("decontam_stream").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("decontam_stream")
    val want = StreamingDecontam.gate(train, bloom)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "stream and batch gates disagree")
    val short = got.filter(col("doc_id") === 100000L).head()
    assert(short.getLong(1) == 0L && short.getLong(2) == 0L && !short.getBoolean(3))
  }
}
