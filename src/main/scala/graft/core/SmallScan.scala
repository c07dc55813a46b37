package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism floor for unsplittable small scans (guide §2.5, input skew:
  * "one huge unsplittable file — repartition immediately after the read").
  *
  * A single-file single-row-group parquet yields ONE non-empty scan
  * partition, so a compute-heavy narrow chain (HTML parse, image decode,
  * signature hashing) downstream of it runs on one core no matter how many
  * the session has. [[spread]] round-robins such a scan across
  * `defaultParallelism` partitions — and is a NO-OP whenever the plan
  * already carries at least that many partitions, so a real multi-row-group
  * table at scale never pays the extra exchange. Apply to the narrow
  * key/text frame BEFORE attaching heavy derived columns, so the exchange
  * moves input rows, not computed payloads. Results are partitioning-
  * independent by the engine's determinism rule (every operator orders by
  * data, never by partition iteration), and the round-robin itself is
  * retry-deterministic via Spark's sort-before-repartition.
  */
object SmallScan {
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    // Gate on the OPTIMIZER's size estimate, not df.rdd.getNumPartitions:
    // materializing the RDD forces physical planning + whole-stage-codegen
    // compilation of the subtree just to read a partition count — measured
    // ~0.5-1 s of pure overhead per query construction. A frame at most one
    // file-split wide cannot scan with more than a handful of partitions,
    // which is exactly the case the repartition exists for.
    val oneSplit = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= oneSplit)
      df.repartition(p)
    else df
  }
}
