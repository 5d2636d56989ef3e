package graft

import org.apache.spark.sql.functions._

/** The events table has shipped with two physical encodings of `ts`:
  * parquet INT64 TIMESTAMP(NANOS) (early testdata) and TIMESTAMP(MICROS)
  * (pyarrow's default, current testdata). `Tables.events` must yield
  * identical rows for both — the reference's parquet scan is a pure
  * pass-through (`/root/reference/main.py:420`) and takes whatever the
  * format declares. This spec hand-writes a NANOS twin of the current
  * file via parquet-mr and proves the reader, and two representative
  * queries, are encoding-invariant. It also proves the nanos branch
  * never mutates the caller session's conf (no cross-query races).
  */
class EventsEncodingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Directory holding an `events.parquet` whose rows equal the current
    * testdata's but stored as INT64 TIMESTAMP(NANOS), with a +999 ns
    * offset on every ts to prove the µs conversion floors (DuckDB's
    * CAST(TIMESTAMP_NS AS TIMESTAMP) semantics). */
  private lazy val nanosDir: String = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

    val rows = graft.queries.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .collect()

    val schema = Types.buildMessage()
      .optional(INT64).named("event_id")
      .optional(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .optional(INT64).named("user_id")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .optional(DOUBLE).named("value")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")

    val dir = tmpDir("events_nanos")
    val out = new org.apache.hadoop.fs.Path(dir.resolve("events.parquet").toString)
    val hconf = spark.sessionState.newHadoopConf()
    hconf.set("parquet.example.schema", schema.toString)
    val writer = ExampleParquetWriter.builder(HadoopOutputFile.fromPath(out, hconf))
      .withConf(hconf).withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { r =>
      val g = gf.newGroup()
      g.add("event_id", r.getLong(0))
      g.add("ts", r.getLong(1) * 1000L + 999L) // sub-µs tail must floor away
      g.add("user_id", r.getLong(2))
      g.add("event_type", r.getString(3))
      g.add("value", r.getDouble(4))
      g.add("props", r.getString(5))
      writer.write(g)
    } finally writer.close()
    dir.toString
  }

  test("Tables.events reads INT64-nanos and TIMESTAMP_MICROS identically") {
    val micros = graft.queries.Tables.events(spark, sf)
    val nanos = graft.queries.Tables.events(spark, nanosDir)
    assert(micros.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(nanos.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val a = micros.orderBy("event_id").collect().toSeq
    val b = nanos.orderBy("event_id").collect().toSeq
    assert(a === b)
  }

  test("q15/q16 results are encoding-invariant") {
    for (q <- Seq("q15_tumbling_window", "q16_sessionize")) {
      val onMicros = SparkEntry.queries(q)(spark, sf).collect().toSet
      val onNanos = SparkEntry.queries(q)(spark, nanosDir).collect().toSet
      assert(onMicros === onNanos, s"$q differs across ts encodings")
    }
  }

  test("nanos branch never mutates the caller session's conf") {
    val before = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    val n = graft.queries.Tables.events(spark, nanosDir).count()
    assert(n > 0)
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") === before)
    // both encodings are joinable in one caller session, concurrently
    val joined = graft.queries.Tables.events(spark, sf).as("m")
      .join(graft.queries.Tables.events(spark, nanosDir).as("n"), Seq("event_id"))
      .where(col("m.ts") === col("n.ts"))
    assert(joined.count() === n)
  }
}
