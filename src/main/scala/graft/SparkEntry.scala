package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DedupQueries, MultimodalQueries, PipelineQueries, Q, RelationalQueries, ScaleQueries, SimilarityQueries, SketchQueries, TextQueries, WebQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every declared operator (SURVEY.md §2B inventory) to a
  * Spark plan builder; `oracleSql` carries the DuckDB-equivalent SQL the
  * driver hash-checks against at sf0.01. Queries without an oracle entry
  * (hash-function-dependent ops like MinHash/SimHash) get the weaker
  * rows-only check.
  */
object SparkEntry {

  private def suites: Seq[Q] =
    RelationalQueries.all ++ DedupQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ MultimodalQueries.all ++ PipelineQueries.all ++
      SketchQueries.all ++ ScaleQueries.all ++ WebQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01.spark(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    suites.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
