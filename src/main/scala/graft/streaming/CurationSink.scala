package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Incremental curation — the continuous form of q55: documents arrive as
  * a file stream, each micro-batch runs the SAME
  * [[graft.queries.PipelineQueries.curate]] plan (exact dedup within the
  * batch → one-pass signals → quality gates → stratified content-hash
  * sample), and the sink is `foreachBatch` with an idempotent per-batch
  * partition overwrite:
  *
  *   - multi-stage batch logic (aggregate → join → filter) is exactly the
  *     `foreachBatch` niche — Append-mode streaming cannot express the
  *     signal aggregation without a watermarked window, and curation gates
  *     are not time-windowed;
  *   - writing each micro-batch to `batch_id=<id>` with `overwrite` makes
  *     REPLAY safe: after a crash between the write and the checkpoint
  *     commit, Structured Streaming re-runs the same batch id and the
  *     overwrite replaces (never duplicates) the partial output — the
  *     standard idempotent-sink recipe for exactly-once file output;
  *   - `Trigger.AvailableNow` drains all pending input then stops, so the
  *     same entry point serves scheduled incremental runs (the production
  *     shape: a new corpus drop lands, one invocation curates it).
  *
  * Because every curation decision is a pure function of document content
  * (content-hash dedup, hash-derived classifier, content-hash sampling),
  * the curated output is identical whether the corpus arrives as one batch
  * or many — only the within-batch dedup scope differs; CROSS-batch exact
  * dedup composes upstream via [[StreamingDedup.firstSeen]] (state = one
  * boolean per content hash). That batch/stream equivalence is what
  * CurationSinkSpec asserts.
  */
object CurationSink {

  /** Drain all available input from `inDir` (parquet file stream), curate
    * each micro-batch, and write to `outDir/batch_id=<n>/`. Returns after
    * the stream stops. Restarting with the same checkpoint skips batches
    * that already committed — new input files only. */
  def drain(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.queries.PipelineQueries.curate(batch)
          .write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$id")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
