package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table readers + shared numeric helpers for the declared query suite.
  *
  * Every query here is verified by hash-match against DuckDB running the
  * same SQL on the same parquet (driver contract). Floating-point sums are
  * the classic hash-mismatch trap: a double SUM is summation-order-dependent
  * and the two engines aggregate in different orders. So every aggregated
  * double goes through exact decimal arithmetic — cast to decimal, sum
  * exactly (order-independent), cast back to double — making the result
  * bit-identical across engines regardless of partitioning/parallelism.
  * That also makes results stable across cluster sizes, which plain double
  * sums are not: the same query on 1 vs 1000 executors returns the same
  * bits.
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = t(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = t(s, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's reader rejects
    * outright; read it as a raw nanosecond long (legacy conf) and convert
    * with integer division (a double division would lose precision at
    * ~1.7e18 ns). DuckDB reads the same column as TIMESTAMP_NS and
    * truncates to µs on CAST — identical floor semantics. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")

  /** Exact decimal type for sums of data-scale doubles: 18 integer digits,
    * 10 fractional. Conversion double→decimal rounds HALF_UP identically in
    * Spark and DuckDB (ties are unreachable for arbitrary binary doubles). */
  val SumDec: DecimalType = DecimalType(28, 10)

  /** Order-independent, engine-exact sum of a double column.
    *
    * The final ROUND(..., 2) before the double cast matters: casting a
    * scale-10 decimal straight to double goes through the scaled int128 in
    * DuckDB, which exceeds 2^53 for big sums and rounds differently than
    * Spark's BigDecimal.doubleValue. After rounding to scale 2 the scaled
    * integer is small enough that both engines' conversions are exact →
    * bit-identical doubles.
    * DuckDB oracle: `CAST(ROUND(SUM(CAST(x AS DECIMAL(28,10))), 2) AS DOUBLE)`. */
  def dsum(c: Column): Column =
    round(sum(c.cast(SumDec)), 2).cast("double")

  /** SQL text of [[dsum]] for oracle strings. */
  def dsumSql(x: String): String =
    s"CAST(ROUND(SUM(CAST($x AS DECIMAL(28,10))), 2) AS DOUBLE)"

  /** Exact decimal product for revenue-style `price * (1 - discount)` terms.
    * Each factor is rounded to 6 decimals first (same in both engines), the
    * product is then exact, so the decimal SUM is exact too. */
  val MulDec: DecimalType = DecimalType(18, 6)
  def revenueTerm(price: Column, discount: Column): Column =
    price.cast(MulDec) * (lit(1).cast(MulDec) - discount.cast(MulDec))
  def revenueTermSql(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(18,6)) * (1 - CAST($discount AS DECIMAL(18,6)))"
}
