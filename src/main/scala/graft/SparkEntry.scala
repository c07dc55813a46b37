package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 re-expressed
  * Spark-first over the driver-provided parquet tables in `sfDir`; the paired
  * [[oracleSql]] is the ANSI-SQL equivalent the driver runs in DuckDB on the
  * same tables. Column names/aliases match exactly on both sides (the driver
  * sorts columns by name before hashing). Every query carries a deterministic
  * ORDER BY on a unique key so row order is reproducible across engines and
  * parallelism levels.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the license-annotation operator end-to-end (SURVEY §2.3 P1). */
  def entry(spark: SparkSession): DataFrame =
    Queries.qLicenseExtract(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles
}
