package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S2/S5 analogs: tolerant JSONL reading.
  *
  * - `RobustJsonlReader` returns instead of raising on an empty/missing input
  *   dir (`robust_jsonl.py:90-91`) → empty DataFrame with the schema.
  * - `yield_jsonl_gz_data_robust` skips malformed JSON lines / truncated gzip
  *   (`data_utils.py:225-257`) → `mode=DROPMALFORMED` (dropped rows are
  *   observable via the reader metrics, the analog of its failure counters).
  */
object RobustSources {

  def robustJsonl(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val path = new java.io.File(dir)
    val hasFiles = path.isDirectory && path.listFiles() != null &&
      path.listFiles().exists(f => f.getName.endsWith(".jsonl") || f.getName.endsWith(".jsonl.gz") || f.getName.endsWith(".json.gz") || f.getName.endsWith(".json"))
    if (!hasFiles) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      spark.read
        .schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(dir)
    }
  }

  /** O4 analog: the reference's `limit` is applied PER TASK, not globally
    * (`script_utils.py:147-148`) — per-partition take(n). */
  def perPartitionLimit(df: DataFrame, n: Int): DataFrame = {
    val schema = df.schema
    val rdd = df.rdd.mapPartitions(_.take(n), preservesPartitioning = true)
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
