package graft

import graft.frontier.{Scheduler, SeenSet}
import graft.functions.GraftFunctions
import graft.gen.SyntheticCorpus

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Stage-by-stage profiling of the crawl epoch (developer tool; the official
  * bench is graft.Bench). Prints one timing line per stage. */
object BenchStages {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_CRAWL_N", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }

    val root = Files.createTempDirectory("bench-stages").toString
    val pages = SyntheticCorpus.pages(spark, n)
    val images = SyntheticCorpus.images(spark, math.max(500L, n / 10)).cache()
    time("images materialize")(images.count())
    val seeds = SyntheticCorpus.seedUrls(spark, n * 2, pageCount = n)
    val robots = SyntheticCorpus.robots(spark)
    val seen = new SeenSet(s"$root/seen", spark)

    val normalized = time("normalize+dedupe (count)") {
      Scheduler.normalize(seeds).cache()
    }
    time("normalize materialize")(normalized.count())
    val unseen = time("seen filter (count)")(seen.filterUnseen(normalized).count())
    val sched = time("politeness window") {
      Scheduler.politenessSelect(
        Scheduler.applyRobots(normalized, robots), math.max(100, (n / 8).toInt)).cache()
    }
    time("politeness materialize")(sched.count())
    time("sched write parquet") {
      sched.write.mode("overwrite").parquet(s"$root/sched")
    }
    val fetched = time("fetch join pages (count)") {
      sched.join(pages.withColumnsRenamed(Map("url" -> "page_url")),
        sched("canon_url") === col("page_url"), "left").cache()
    }
    time("fetch materialize")(fetched.count())
    time("license extract (count)") {
      fetched.withColumn("__lic", GraftFunctions.extractCcLicenses(col("html")))
        .select(col("__lic").getField("parse_error").as("pe")).filter(col("pe") === false).count()
    }
    time("image check+join (count)") {
      // CrawlEpoch shape: decode on the images SIDE (one decode per image,
      // blobs never cross the exchange), then join narrow check results
      val checked = images
        .withColumn("__chk", when(col("bytes").isNotNull,
          GraftFunctions.imageCheck(col("bytes"),
            substring(col("image_id"), 5, 8).cast("long"), col("w"), col("h"))))
        .select(col("image_id"), (col("__chk").getField("psnr") >= 40.0).as("pixels_ok"))
      fetched.select(col("image_id"))
        .join(checked, Seq("image_id"), "left")
        .filter(col("pixels_ok")).count()
    }
    time("seen add (bloom+commit)") {
      seen.add(sched.select(col("url_hash")))
    }
    time("links extract (count)") {
      pages.join(sched.select(col("canon_url")), pages("url") === col("canon_url"), "left_semi")
        .select(explode(GraftFunctions.extractLinks(col("html"))).as("url")).count()
    }
    spark.stop()
  }
}
