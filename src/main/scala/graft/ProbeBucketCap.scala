package graft

import graft.functions.GraftFunctions

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness behind the round-6 §8a claim (OPTIMIZATION_r06.md):
  * the LSH bucket cap as a bounded top-k aggregate vs the row_number-window
  * formulation it replaced, on a corpus where the cap BINDS — one hot
  * 16-bit band bucket of `hot` rows (every boilerplate-heavy crawl has one)
  * among `n` total rows. Both arms run the identical banding + pair-emit +
  * verify tail; only the cap mechanism differs. Reports wall seconds and
  * total shuffle-write bytes per arm, and cross-checks that pair count and
  * a pair checksum agree between arms (the semantic-equality claim, at a
  * scale the unit spec cannot reach).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ProbeBucketCap"
  * Knobs: SPARK_GRAFT_PROBE_N (default 500000), SPARK_GRAFT_PROBE_HOT
  * (200000), SPARK_GRAFT_PROBE_CAP (1000).
  */
object ProbeBucketCap {

  private def banded(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), col("sig"), posexplode(array(
      (0 until 4).map(j =>
        shiftrightunsigned(col("sig"), j * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_key"))

  private def pairTail(members: DataFrame): DataFrame =
    members
      .select(explode(GraftFunctions.sortedPairs(col("members"))).as("p"))
      .select(
        col("p").getField("a").getField("id").as("a_id"),
        col("p").getField("b").getField("id").as("b_id"),
        bit_count(col("p").getField("a").getField("sig")
          .bitwiseXOR(col("p").getField("b").getField("sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)

  /** The round-5 shape: full bucket through exchange + sort, then cap. */
  private def windowArm(sigs: DataFrame, cap: Int): DataFrame =
    pairTail(banded(sigs)
      .withColumn("bucket_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_key")).orderBy(col("id"))))
      .filter(col("bucket_rank") <= cap)
      .groupBy(col("band"), col("band_key"))
      .agg(sort_array(collect_list(struct(col("id"), col("sig")))).as("members")))

  /** The round-6 shape: state bounded by the cap, partial aggregation. */
  private def boundedArm(sigs: DataFrame, cap: Int): DataFrame =
    pairTail(banded(sigs)
      .groupBy(col("band"), col("band_key"))
      .agg(GraftFunctions.boundedMinList(
        struct(col("id"), col("sig")), cap).as("members")))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "500000").toLong
    val hot = sys.env.getOrElse("SPARK_GRAFT_PROBE_HOT", "200000").toLong
    val cap = sys.env.getOrElse("SPARK_GRAFT_PROBE_CAP", "1000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    // ids 0..hot-1 share band 0 (low 16 bits pinned) — ONE hot bucket of
    // `hot` rows; everything else is xxhash64-uniform (~n*4/65536 rows per
    // sparse bucket). Deterministic, identical input for both arms.
    val sigs = spark.range(n).select(col("id"),
      when(col("id") < hot,
        xxhash64(col("id")).bitwiseAND(lit(~0xffffL)).bitwiseOR(lit(0x1234L)))
        .otherwise(xxhash64(col("id"))).as("sig"))
      .persist()
    sigs.count() // materialize outside the timed region

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)

    def run(name: String, df: => DataFrame): (Double, Long, Long, Long) = {
      spark.sparkContext.setJobDescription(s"probe_bucket_cap:$name")
      Thread.sleep(1000) // let prior stage events drain
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val row = df.agg(count(lit(1)).as("pairs"),
        coalesce(bit_xor(xxhash64(col("a_id"), col("b_id"))), lit(0L)).as("chk"))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      (sec, shuffleBytes.get(), row.getLong(0), row.getLong(1))
    }

    // warm both plans once (codegen/JIT), then measure twice each, interleaved
    run("warm_window", windowArm(sigs, cap))
    run("warm_bounded", boundedArm(sigs, cap))
    val w1 = run("window_1", windowArm(sigs, cap))
    val b1 = run("bounded_1", boundedArm(sigs, cap))
    val w2 = run("window_2", windowArm(sigs, cap))
    val b2 = run("bounded_2", boundedArm(sigs, cap))

    val equal = w1._3 == b1._3 && w1._4 == b1._4
    println(f"""{"probe_bucket_cap":{"cpus":$cpus,"n":$n,"hot":$hot,"cap":$cap,""" +
      f""""window_sec":[${w1._1}%.2f,${w2._1}%.2f],"window_shuffle_mb":[${w1._2 / 1e6}%.1f,${w2._2 / 1e6}%.1f],""" +
      f""""bounded_sec":[${b1._1}%.2f,${b2._1}%.2f],"bounded_shuffle_mb":[${b1._2 / 1e6}%.1f,${b2._2 / 1e6}%.1f],""" +
      f""""pairs":${w1._3},"pairs_equal_and_checksum_equal":$equal}}""")
    require(equal, s"arm mismatch: window=(${w1._3},${w1._4}) bounded=(${b1._3},${b1._4})")
    spark.stop()
  }
}
