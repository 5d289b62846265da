package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One named query + the ANSI SQL the DuckDB oracle runs over the same
  * parquet tables. `oracle = None` → the driver records a weaker rows-only
  * check (used for ops whose values are not portably SQL-expressible, e.g.
  * HLL sketches). */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

/** Cross-engine parity helpers shared by every query module.
  *
  * Rules (SURVEY.md §5.2; every catalog query obeys them — the driver
  * hash-compares values, so "close" is a fail):
  *  - Money/quantity sums go through DECIMAL(18,2) so both engines sum
  *    exactly, then cast to DOUBLE once at the end.
  *  - Timestamps in outputs become epoch milliseconds as BIGINT.
  *  - Integer-ish outputs are LongType (DuckDB aggregates return BIGINT).
  *  - Every query ends in a deterministic ORDER BY with a unique tie-break.
  *  - Hash-valued outputs derive from md5 only (graft.functions.PortableHash).
  */
object Parity {
  def dec(c: Column): Column = c.cast("decimal(18,2)")
  def dec(name: String): Column = dec(col(name))
  val oneDec: Column = lit(1).cast("decimal(18,2)")
  /** exact decimal sum surfaced as double */
  def dsum(c: Column): Column = sum(c).cast("double")
  /** Timestamp literal parsed by Catalyst in the SESSION timezone (pinned
    * UTC by Verify/Bench/tests) — never java.sql.Timestamp.valueOf, which
    * uses the JVM default timezone. */
  def ts(s: String): Column = expr(s"TIMESTAMP '$s'")

  def sqlDec(e: String): String = s"CAST($e AS DECIMAL(18,2))"
  def sqlDsum(e: String): String = s"CAST(sum($e) AS DOUBLE)"

  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** [[tbl]] + `Tables.widen`: ONLY for scans feeding CPU-heavy per-row
    * work (the md5-per-shingle builders) — measured harmful elsewhere
    * (see Tables.widen scaladoc). */
  def tblWide(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name, wide = true)

  /** Register the named tables as temp views (for spark.sql-built queries —
    * grouping sets, correlated subqueries — so our SQL mirrors the oracle). */
  def views(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => tbl(spark, dir, n).createOrReplaceTempView(n))
}
