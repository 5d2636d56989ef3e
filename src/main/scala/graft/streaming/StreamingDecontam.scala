package graft.streaming

import graft.queries.ScaleQueries
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stateless streaming decontamination gate — q60's broadcast-Bloom
  * benchmark pre-filter as a CONTINUOUS ingestion guard: documents arrive
  * as a stream, each row is scored against a benchmark-shingle Bloom
  * filter baked into the plan as a 128-long literal, and contaminated
  * rows are flagged before they ever reach the corpus sink.
  *
  * Why stateless matters: the gate is one codegen'd projection — the
  * per-row shingle walk is an `aggregate` fold over the token positions
  * (no explode, no per-doc groupBy), so there is NO state store, no
  * watermark, and the gate is legal in any output mode, composable in
  * front of [[CurationSink]] or [[StreamingDedup]]. At 100 TB/day of
  * arrivals the cost is one pass of md5s per row and a 1 KiB broadcast —
  * the same "filter is ≤128 words at any benchmark size" argument as
  * q60, with zero false NEGATIVES by Bloom construction (a doc sharing
  * an exact 8-gram with the benchmark always hits both probe bits), so
  * nothing contaminated slips through; false positives only cost a
  * second-stage exact check on the flagged sliver.
  */
object StreamingDecontam {

  /** Dense 128-long Bloom word array from the benchmark corpus (q60's
    * build, collected driver-side — the filter is ≤128 rows at ANY
    * benchmark size; persist/reload via parquet as BloomReuseSpec does
    * when the benchmark outlives one job). */
  def buildBloomWords(benchDocs: DataFrame): Array[Long] = {
    val nWords = (ScaleQueries.BloomBits / ScaleQueries.WordBits).toInt
    val words = new Array[Long](nWords)
    ScaleQueries.bloomBuild(ScaleQueries.bloomProbes(benchDocs))
      .collect()
      .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** `(n_shingles, n_hits)` for one text column against the literal
    * Bloom: a pure expression-level fold over the 8-word shingle
    * positions — each position's digest probes two bits; both set ⇒ a
    * hit. Counts POSITIONS (q60's batch form counts distinct shingles —
    * the flag decision `n_hits > 0` is identical, and the positional
    * count is what an excision pass needs anyway). */
  def hitCols(text: Column, bloom: Array[Long]): (Column, Column) = {
    val bits = ScaleQueries.BloomBits
    val wordBits = ScaleQueries.WordBits
    val bl = typedLit(bloom.toSeq)
    val w = split(text, "\\s+")
    val nSh = greatest(size(w) - 7, lit(0)).cast("long")
    def probe(g: Column, lo: Boolean): Column = {
      val p = conv(substring(g, if (lo) 1 else 9, 8), 16, 10)
        .cast("long") % bits
      // p < 4096, so the double division is exact; masks stay in 0..31
      val word = (p / lit(wordBits.toDouble)).cast("int")
      val mask =
        call_function("shiftleft", lit(1L), (p % lit(wordBits)).cast("int"))
      try_element_at(bl, word + 1).bitwiseAND(mask) === mask
    }
    val nHits = when(size(w) >= 8,
      aggregate(sequence(lit(1), size(w) - 7), lit(0L), (acc, i) => {
        val g = md5(array_join(slice(w, i, lit(8)), " "))
        when(probe(g, lo = true) && probe(g, lo = false), acc + 1L)
          .otherwise(acc)
      })).otherwise(lit(0L))
    (nSh, nHits)
  }

  /** Gate a document frame — streaming or batch; the plan is the same
    * stateless projection either way. Output: `(doc_id, n_shingles,
    * n_hits, flagged)`. */
  def gate(docs: DataFrame, bloom: Array[Long]): DataFrame = {
    val (nSh, nHits) = hitCols(col("text"), bloom)
    docs.select(col("doc_id"), nSh.as("n_shingles"), nHits.as("n_hits"))
      .withColumn("flagged", col("n_hits") > 0L)
  }
}
