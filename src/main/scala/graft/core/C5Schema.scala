package graft.core

import org.apache.spark.sql.types._

/** The reference's canonical output schema — 22 columns, exact shape of
  * `SCHEMA` in `/root/reference/src/c5/script_utils.py:285-323` (nullable
  * variant `:325-363`), including the struct-of-8-parallel-arrays
  * `potential_licenses` (the Arrow workaround documented at
  * `license_annotator.py:68-71`; Spark could hold array<struct>, the
  * projection to this shape is kept for byte-compatible output).
  */
object C5Schema {

  val potentialLicenses: StructType = StructType(Seq(
    StructField("abbr", ArrayType(StringType), nullable = false),
    StructField("in_footer", ArrayType(BooleanType), nullable = false),
    StructField("in_head", ArrayType(BooleanType), nullable = false),
    StructField("location", ArrayType(StringType), nullable = false),
    StructField("version", ArrayType(StringType), nullable = false),
    StructField("element", ArrayType(StringType), nullable = false),
    StructField("left_context", ArrayType(StringType), nullable = false),
    StructField("right_context", ArrayType(StringType), nullable = false)))

  /** Strict schema (upload-time, `SCHEMA`). */
  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("dump", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("date", StringType, nullable = false), // crawl date kept as string
    StructField("file_path", StringType, nullable = false),
    StructField("license_abbr", StringType, nullable = false),
    StructField("license_version", StringType, nullable = true),
    StructField("license_location", StringType, nullable = false),
    StructField("license_in_head", BooleanType, nullable = false),
    StructField("license_in_footer", BooleanType, nullable = false),
    StructField("license_element", StringType, nullable = false),
    StructField("license_left_context", StringType, nullable = false),
    StructField("license_right_context", StringType, nullable = false),
    StructField("potential_licenses", potentialLicenses, nullable = true),
    StructField("license_parse_error", BooleanType, nullable = false),
    StructField("license_disagreement", BooleanType, nullable = false),
    StructField("language_script", StringType, nullable = false),
    StructField("language", StringType, nullable = false),
    StructField("language_score", DoubleType, nullable = false),
    StructField("found_in_fw", BooleanType, nullable = true)))

  /** All-nullable variant (post-processing readers, `SCHEMA_NULLABLE`). */
  val schemaNullable: StructType = StructType(schema.fields.map { f =>
    val dt = f.dataType match {
      case st: StructType => StructType(st.fields.map(_.copy(nullable = true)))
      case other => other
    }
    f.copy(dataType = dt, nullable = true)
  })
}
