package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{ScaleQueries, Tables}

/** End-to-end proof that the q64 Z-order key buys parquet data skipping on
  * BOTH dimensions — the 100 TB payoff the query itself can only hint at.
  *
  * Two physical layouts of the same orders table, 8 files each:
  *   A: range-partitioned + sorted by o_custkey alone (the classic
  *      single-dim sort — perfect custkey pruning, zero date pruning);
  *   B: range-partitioned + sorted by the Morton z of (custkey, date).
  *
  * We then read the actual parquet FOOTER statistics (what any engine's
  * scan planner prunes with) and count which row groups a date-range
  * predicate would have to read. Layout A must read everything; layout B
  * must skip at least half. Conversely, custkey pruning must keep working
  * under B (each file covers a bounded slice of the custkey range).
  */
class ZOrderLayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val NumFiles = 8

  /** (path, min, max) of the given int64-backed column for every row group
    * across all parquet parts in dir. */
  private def rowGroupStats(dir: String, column: String): Seq[(String, Long, Long)] = {
    val conf = new Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    files.toSeq.flatMap { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        reader.getFooter.getBlocks.asScala.toSeq.map { block =>
          val cc = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(fail(s"no column $column in ${f.getName}"))
          val st = cc.getStatistics
          (f.getName,
            st.genericGetMin.asInstanceOf[Number].longValue(),
            st.genericGetMax.asInstanceOf[Number].longValue())
        }
      } finally reader.close()
    }
  }

  /** Written once, shared by both tests; the key is q64's own projection
    * (ScaleQueries.zOrderKey), so the layout proof cannot drift from the
    * query. */
  private lazy val layouts: (String, String) = {
    val scaled = ScaleQueries.zOrderKey(Tables.orders(spark, sf))
      .select("o_orderkey", "o_custkey", "o_orderdate", "z")

    val byCust = tmpDir("zorder_bycust").toString
    scaled.repartitionByRange(NumFiles, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .drop("z")
      .write.mode("overwrite").parquet(byCust)

    val byZ = tmpDir("zorder_byz").toString
    scaled.repartitionByRange(NumFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(byZ)
    (byCust, byZ)
  }

  test("z-order layout skips row groups on the date dimension; single-dim sort cannot") {
    val (byCust, byZ) = layouts

    def candidates(dir: String, lo: Long, hi: Long): (Int, Int) = {
      val stats = rowGroupStats(dir, "o_orderdate")
      (stats.count { case (_, mn, mx) => mx >= lo && mn <= hi }, stats.size)
    }
    // query box: ~8% of the date range, placed inside one quarter of the
    // axis (26%..34%) so it does not straddle the top Morton bits — a box
    // centered on the axis midpoint crosses the y15 boundary and touches
    // twice as many curve octants (still prunes, just less).
    val all = rowGroupStats(byCust, "o_orderdate")
    val gMin = all.map(_._2).min
    val gMax = all.map(_._3).max
    val lo = gMin + (gMax - gMin) * 26 / 100
    val hi = gMin + (gMax - gMin) * 34 / 100

    val (custHits, custTotal) = candidates(byCust, lo, hi)
    val (zHits, zTotal) = candidates(byZ, lo, hi)
    // custkey-sorted files all span the whole date range — nothing skips
    assert(custHits === custTotal, s"expected no date pruning, got $custHits/$custTotal")
    // z-ordered files cover bounded date slices — at least half skip
    assert(zHits * 2 <= zTotal, s"z layout pruned only ${zTotal - zHits}/$zTotal")
  }

  test("z-order layout still bounds the custkey extent per file") {
    val (_, byZ) = layouts
    val stats = rowGroupStats(byZ, "o_custkey")
    val gMin = stats.map(_._2).min
    val gMax = stats.map(_._3).max
    val globalExtent = (gMax - gMin).toDouble
    val meanExtent = stats.map { case (_, mn, mx) => (mx - mn).toDouble }.sum / stats.size
    // not perfect like a custkey sort, but must stay well under the full range
    assert(meanExtent < globalExtent * 0.75,
      s"meanExtent=$meanExtent globalExtent=$globalExtent")
  }
}
