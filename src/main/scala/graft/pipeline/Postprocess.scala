package graft.pipeline

import graft.core.C5Schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Post-processing dataset variants over the C5 output
  * (`scripts/post_processing/create_fine_version.py:13-30`): both are narrow
  * filters + a column drop — one codegen'd pass over the scan, no shuffle.
  */
object Postprocess {

  /** Published-parquet read-back with the all-nullable SCHEMA_NULLABLE
    * variant (`script_utils.py:325-363`) — the schema the reference's
    * post-processing readers (fine/strict creators, containment backfill)
    * load with. Pinning the schema keeps the scan pruned and immune to
    * inference drift across shards. */
  def readC5(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(C5Schema.schemaNullable).parquet(dir)

  /** The -fine variant (`create_fine_version.py:13-16`): rows found in
    * FineWeb(-2); `found_in_fw` null counts as not-found (`row.get(...,
    * False) is True`). The column is dropped from the output
    * (`remove_columns("found_in_fw")`). */
  def fineVersion(c5: DataFrame): DataFrame =
    c5.filter(col("found_in_fw") === true).drop("found_in_fw")

  /** The -strict variant (`create_fine_version.py:19-30`): additionally no
    * license disagreement, no non-commercial ("nc" substring) or cc-unknown
    * license, and no "wiki" substring in the url. */
  def strictVersion(c5: DataFrame): DataFrame =
    c5.filter(
      !col("license_disagreement") &&
        col("found_in_fw") === true &&
        !col("license_abbr").contains("nc") &&
        col("license_abbr") =!= "cc-unknown" &&
        !col("url").contains("wiki"))
      .drop("found_in_fw")
}
