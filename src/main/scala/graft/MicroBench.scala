package graft

import graft.functions.GraftFunctions
import graft.gen.SyntheticCorpus

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pure-compute scaling probe: the two hot map kernels (license extraction
  * over HTML, image decode+verify) as single embarrassingly-parallel jobs —
  * no joins, no writes, no state. This isolates ENGINE compute scaling from
  * the sandbox's shared-disk / driver-latency artifacts; on a multi-executor
  * cluster these are the per-core-bound stages.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nHtml = sys.env.getOrElse("SPARK_GRAFT_MICRO_HTML", "2000000").toLong
    val nImg = sys.env.getOrElse("SPARK_GRAFT_MICRO_IMG", "300000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm up codegen + JIT
    SyntheticCorpus.pages(spark, 10000)
      .select(GraftFunctions.extractCcLicenses(col("html")).getField("parse_error").as("pe"))
      .filter(!col("pe")).count()

    val licSec = time {
      SyntheticCorpus.pages(spark, nHtml)
        .select(GraftFunctions.extractCcLicenses(col("html")).getField("licenses").as("l"))
        .select(sum(size(col("l"))).as("n")).collect()
    }
    val imgSec = time {
      val w = (pmod(col("id"), lit(64)) + 16).cast("int")
      val h = (pmod(col("id"), lit(48)) + 16).cast("int")
      val fmt = element_at(array(lit("png"), lit("bmp"), lit("jpeg")), (pmod(col("id"), lit(3)) + 1).cast("int"))
      spark.range(nImg)
        .select(GraftFunctions.imageCheck(
          GraftFunctions.genImage(col("id"), w, h, fmt), col("id"), w, h).getField("psnr").as("p"))
        .select(count(when(col("p") >= 40.0, 1)).as("ok")).collect()
    }
    println(f"""{"micro":{"cpus":$cpus,"html_rows":$nHtml,"html_sec":$licSec%.2f,"html_rows_per_sec":${nHtml / licSec}%.0f,"img_rows":$nImg,"img_sec":$imgSec%.2f,"img_rows_per_sec":${nImg / imgSec}%.0f}}""")
    spark.stop()
  }
}
