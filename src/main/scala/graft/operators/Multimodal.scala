package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus a typed metadata struct, and run decode /
  * feature-extraction as a partition-wise typed transformation.
  *
  * The decode step itself is STUBBED (no image/audio codecs exist in this
  * offline container): [[FakeDecoder.decode]] derives deterministic
  * pseudo-metadata and a fixed-length feature vector from the payload
  * bytes. Everything AROUND the stub is the real Spark shape a production
  * decoder would use:
  *
  *  - payloads stay `Array[Byte]` end-to-end (no driver materialization);
  *  - the work runs via `Dataset.mapPartitions` with product encoders — the
  *    JVM twin of `mapInPandas` (one iterator per partition, so a real
  *    decoder amortizes model/codec init across its partition's rows);
  *  - output is a typed row (id, meta, features) ready for the similarity
  *    suite to consume.
  *
  * Swapping in a real decoder = replacing the body of `FakeDecoder.decode`;
  * schema, partitioning and batch shape are unchanged.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], kind: String)
  final case class MediaMeta(n_bytes: Long, width: Int, height: Int, format: String)
  final case class DecodedRow(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      format: String,
      features: Array[Float])

  object FakeDecoder {
    val FeatureDim = 8

    /** Deterministic stand-in for an image decode + feature extraction.
      * Real implementation would parse the container header and run a
      * vision model; this derives everything from the bytes so tests are
      * reproducible. */
    def decode(row: MediaRow): DecodedRow = {
      val bytes = row.payload
      var h = 1469598103934665603L
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L; i += 1 }
      val width = 64 + math.floorMod(h, 512).toInt
      val height = 64 + math.floorMod(h >> 9, 512).toInt
      val features = Array.tabulate(FeatureDim) { d =>
        val hd = h * (d * 2 + 1) + d
        (math.floorMod(hd, 2000) - 1000) / 1000.0f
      }
      DecodedRow(row.doc_id, bytes.length.toLong, width, height,
        if (bytes.isEmpty) "empty" else "fake/v1", features)
    }
  }

  /** documents.text bytes stand in for media payloads; real pipelines would
    * read payload files/blob columns the same way. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        lit("image").as("kind"))
      .as[MediaRow]
  }

  /** Partition-wise decode: the real-decoder shape (iterator in, iterator
    * out, per-partition init amortized). */
  def decodeAll(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // a real decoder would init its codec/model HERE, once per partition
      rows.map(FakeDecoder.decode)
    }
  }

  /** Declared query: decode features + a feature-norm summary, flattened to
    * a stable schema for the rows-only check. */
  def query(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeAll(mediaTable(s, dir))
      .withColumn("feat_norm",
        sqrt(aggregate(col("features"),
          lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .select("doc_id", "n_bytes", "width", "height", "format", "feat_norm")
      .orderBy("doc_id")
  }
}
