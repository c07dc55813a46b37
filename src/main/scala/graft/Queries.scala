package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The operator-inventory query surface (SURVEY.md §2): one named query per
  * operator, each paired with a DuckDB oracle in [[oracles]].
  *
  * Numeric discipline: double sums are computed on integer cents
  * (`CAST(ROUND(x*100) AS BIGINT)`) so results are exact and identical across
  * Spark partition orders and DuckDB — floating-point accumulation order never
  * leaks into the comparison. Every query orders by a deterministic unique key.
  */
object Queries {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Exact integer-cents of a double column. */
  def cents(c: Column): Column = round(c * 100).cast("bigint")

  // -------------------------------------------------------------------------
  // Aggregations (SURVEY §2.6)
  // -------------------------------------------------------------------------

  /** A2/A4-style hash aggregate with map-side partial aggregation; analog of
    * the reference's Counter-over-batches (`find_top_domains.py:76-82`). */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("bigint").as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
      |  COUNT(*) AS n_rows,
      |  COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -------------------------------------------------------------------------
  // Registry
  // -------------------------------------------------------------------------

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
