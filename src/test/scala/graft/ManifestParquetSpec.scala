package graft

import graft.crawl.PageStore
import graft.sources.ManifestParquet

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Pins the manifest catalog (VERDICT r4 next-round #3): reads plan from the
  * single-file manifest instead of directory listings, prune correctness,
  * and schema/row equality with the listing-based read. */
class ManifestParquetSpec extends SparkSpecBase {

  private def freshStore(nBuckets: Int): String = {
    import spark.implicits._
    val path = Files.createTempDirectory("maniftest").toString
    val pages = (0L until 5000L)
      .map(i => (s"http://host${i % 7}.example/p/$i", s"<html>$i</html>", s"img-$i"))
      .toDF("url", "html", "image_id")
    PageStore.write(pages, path, nBuckets, fingerprint = "spec")
    path
  }

  test("manifest read: identical rows and schema to the listing-based read") {
    val path = freshStore(16)
    assert(ManifestParquet.hasManifest(path))
    val viaManifest = ManifestParquet.read(spark, path)
    val viaListing = spark.read.parquet(path)
    assert(viaManifest.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      viaListing.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = viaManifest.orderBy("page_hash").collect().toSeq
    val b = viaListing.orderBy("page_hash").collect().toSeq
    assert(a === b)
    assert(a.size === 5000)
  }

  test("bucket filter reaches the manifest index as a partition filter: only those buckets' files scanned") {
    val path = freshStore(16)
    val pruned = ManifestParquet.read(spark, path)
      .where(col("bucket").isin(3, 7))
    // file-level proof: every file the scan actually opened lives under a
    // selected bucket directory — the others were pruned from the manifest
    // entries, no listing involved
    val filesTouched = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(filesTouched.nonEmpty)
    filesTouched.foreach(f =>
      assert(f.contains("bucket=3/") || f.contains("bucket=7/"),
        s"file outside pruned buckets: $f"))
    // value-level: pruned read == full read filtered
    val expect = spark.read.parquet(path).where(col("bucket").isin(3, 7))
      .orderBy("page_hash").collect().toSeq
    assert(pruned.orderBy("page_hash").collect().toSeq === expect)
  }

  test("readForSchedule over the manifest: byte-equal to unpruned, scan ∝ schedule") {
    import spark.implicits._
    val path = freshStore(32)
    // a schedule touching a handful of hashes → few buckets
    val scheduled = ManifestParquet.read(spark, path)
      .limit(40).select(col("page_hash").as("url_hash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nSched = scheduled.count()
      val pruned = PageStore.readForSchedule(spark, path, scheduled, nSched)
      val all = spark.read.parquet(path).drop("bucket")
      // every scheduled hash's page is present in the pruned frame (prune
      // exactness: a match can only live in its own hash's bucket)
      val hits = pruned.join(scheduled, pruned("page_hash") === scheduled("url_hash"))
      assert(hits.count() === nSched)
      // and the pruned frame is a subset of the store
      assert(pruned.exceptAll(all).isEmpty)
      // scan proportionality: distinct files touched ≤ distinct buckets of
      // the schedule (≤ 40), not the store's 32-bucket full file set
      val schedBuckets = scheduled
        .select(PageStore.bucketOf(col("url_hash"), 32).as("b"))
        .distinct().as[Int].collect().toSet
      val filesTouched = pruned.select(input_file_name()).distinct()
        .collect().map(_.getString(0)).toSeq
      filesTouched.foreach { f =>
        val b = "bucket=(\\d+)/".r.findFirstMatchIn(f).map(_.group(1).toInt)
        assert(b.exists(schedBuckets.contains), s"unscheduled bucket file: $f")
      }
    } finally scheduled.unpersist(blocking = false)
  }
}
