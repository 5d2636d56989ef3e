package graft

import org.apache.spark.sql.functions._

import graft.queries.{ScaleQueries, Tables}

/** The property that justifies q60's existence next to Catalyst's own
  * InjectRuntimeFilter: the Bloom filter is a PERSISTABLE ARTIFACT. Build
  * it once from the held-out benchmark corpus, write it as a ≤128-row
  * parquet table, and any later batch job or stream loads and applies it
  * without touching the benchmark corpus again — runtime filters live and
  * die inside one plan. This spec proves the round trip: flags computed
  * against the reloaded filter (in a fresh session) are identical to
  * flags computed against the freshly built one. */
class BloomReuseSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bloom filter saved to parquet and reloaded in a new session flags identically") {
    val docs = Tables.documents(spark, sf)
    val probes = ScaleQueries.bloomProbes(docs).localCheckpoint()
    val bench = probes.filter(col("doc_id") % 101 === 0)
    val train = probes.filter(col("doc_id") % 101 =!= 0)

    // job 1: build the filter and persist the artifact
    val store = tmpDir("bloom_store").resolve("bench_bloom").toString
    ScaleQueries.bloomBuild(bench).write.mode("overwrite").parquet(store)
    assert(spark.read.parquet(store).count() <= 128)

    // job 2 (fresh session — nothing shared but the bytes on disk):
    // re-derive the training probes there and apply the reloaded filter
    val s2 = spark.newSession()
    val reloaded = s2.read.parquet(store)
    val train2 = ScaleQueries.bloomProbes(Tables.documents(s2, sf))
      .filter(col("doc_id") % 101 =!= 0)
    val viaArtifact = ScaleQueries.bloomApply(train2, reloaded)
      .orderBy("doc_id").collect()

    val fresh = ScaleQueries.bloomApply(train, ScaleQueries.bloomBuild(bench))
      .orderBy("doc_id").collect()
    assert(viaArtifact.toSeq == fresh.toSeq)
    assert(viaArtifact.nonEmpty)
  }
}
