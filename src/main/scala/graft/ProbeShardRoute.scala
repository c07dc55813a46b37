package graft

import graft.frontier.{BloomProbe, SeenSet}
import graft.functions.GraftFunctions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Scale probe for SHARD-ROUTED seen-probing (developer tool, VERDICT r4 #2):
  * measures the two quantities routing changes, on the same input, outputs
  * checked equal:
  *
  *   1. PURITY — distinct Bloom shards touched per task. Unrouted, every
  *      task touches ~every shard (its url_hashes are arbitrary), so per-
  *      executor resident filter bytes converge on the WHOLE family (~12 GB
  *      at 10^10 keys). Routed, each task touches exactly 1 — residency is
  *      `totalBytes / shardCount` per task slot.
  *   2. THRASH under a byte-capped cache — with the executor-wide probe
  *      cache capped below the family size (the 10^10 mitigation knob),
  *      unrouted probing re-deserializes shard files per miss because
  *      consecutive rows alternate shards; routed probing loads each shard
  *      ~once. Reported as shard-file loads + bytes deserialized.
  *
  * The win PRECONDITION this probe also demonstrates: shardCount must
  * exceed the executor's concurrent task slots (here S=64 > 32 threads) —
  * with S=16 at 32 slots the full family is resident even routed. That is
  * exactly why ShardCount is a first-build parameter now, not a constant.
  *
  * Env: SPARK_GRAFT_SEEN_N (default 4M), SPARK_GRAFT_FRONTIER_N (200k),
  * SPARK_GRAFT_SHARDS (64), SPARK_GRAFT_SLOTS (1), SPARK_GRAFT_CPUS (32),
  * SPARK_GRAFT_CAP_SHARDS (40 — byte cap for arm 2, in shards).
  */
object ProbeShardRoute {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val seenN = sys.env.getOrElse("SPARK_GRAFT_SEEN_N", "4000000").toLong
    val frontN = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "200000").toLong
    val shards = sys.env.getOrElse("SPARK_GRAFT_SHARDS", "64").toInt
    val slots = sys.env.getOrElse("SPARK_GRAFT_SLOTS", "1").toInt
    val capShards = sys.env.getOrElse("SPARK_GRAFT_CAP_SHARDS", "40").toInt
    val shm = if (Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
      Some(Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "probe-route")) else None
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = shm.fold(builder)(p =>
      builder.config("spark.local.dir", p.toString)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val root = shm.map(p => Files.createTempDirectory(p, "seen"))
      .getOrElse(Files.createTempDirectory("probe-seen")).toString
    val seen = new SeenSet(root, spark, expectedKeys = seenN, shardCount = shards)
    val hash = call_function("url_hash64", concat(lit("http://h"), col("id")))
    println(s"[probe] building seen set: $seenN keys, $shards shards")
    seen.add(spark.range(seenN).select(hash.as("url_hash")))
    // frontier: half known-seen (maybes that confirm), half fresh
    val frontier = spark.range(frontN).select(
      when(col("id") % 2 === 0,
        call_function("url_hash64", concat(lit("http://h"), col("id") * 2)))
        .otherwise(call_function("url_hash64", concat(lit("http://x"), col("id"))))
        .as("url_hash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    frontier.count()

    def arm(routed: Boolean) =
      if (routed) seen.filterUnseenRouted(frontier, slotsPerShard = slots)
      else seen.filterUnseen(frontier)

    // outputs equal (routing only moves rows): except-both-ways empty
    val (ur, r) = (arm(routed = false), arm(routed = true))
    require(r.exceptAll(ur).isEmpty && ur.exceptAll(r).isEmpty,
      "routed and unrouted outputs differ")
    println(s"[probe] outputs equal: ${ur.count()} rows either way")

    def touchStats(label: String, routed: Boolean): Unit = {
      BloomProbe.trackTouches = true
      BloomProbe.resetTracking()
      val t0 = System.nanoTime()
      arm(routed).count()
      val sec = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val byTask = BloomProbe.touches.asScala.toSeq.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.size).values.toSeq
      BloomProbe.trackTouches = false
      println(f"[probe] $label: tasks=${byTask.size} " +
        f"shards/task avg=${byTask.sum.toDouble / math.max(1, byTask.size)}%.1f " +
        f"max=${if (byTask.isEmpty) 0 else byTask.max} wall=$sec%.2f s")
    }
    touchStats("purity unrouted", routed = false)
    touchStats("purity routed  ", routed = true)

    // thrash under a byte cap: capShards × one shard's serialized size.
    // Each arm starts COLD (cache cleared) so loads/bytes are the arm's own
    // re-read cost, not inherited residency. The unrouted arm's loads grow
    // with ROWS (consecutive rows alternate shards, each miss re-reads a
    // file) — a smaller frontier keeps the demonstration cheap; the routed
    // arm's loads stay ~= shard count at any frontier size.
    val capFrontN = sys.env.get("SPARK_GRAFT_CAP_FRONTIER_N")
      .map(_.toLong).getOrElse(math.max(50000L, frontN / 5))
    val capFrontier = spark.range(capFrontN).select(
      call_function("url_hash64", concat(lit("http://c"), col("id")))
        .as("url_hash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    capFrontier.count()
    val shardBytes = Files.size(java.nio.file.Paths.get(
      root, "snapshots").toFile.listFiles()
      .filter(_.getName.matches("bloom-v\\d+-s0\\.bin")).head.toPath)
    BloomProbe.setBudgetForTest(Some(capShards * shardBytes))
    def capStats(label: String, routed: Boolean): Unit = {
      BloomProbe.clearCacheForTest()
      BloomProbe.trackTouches = true
      BloomProbe.resetTracking()
      val t0 = System.nanoTime()
      (if (routed) seen.filterUnseenRouted(capFrontier, slotsPerShard = slots)
       else seen.filterUnseen(capFrontier)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val (loads, bytes) = (BloomProbe.loads.get(), BloomProbe.loadedBytes.get())
      BloomProbe.trackTouches = false
      println(f"[probe] $label (cache capped at $capShards/$shards shards, " +
        f"$capFrontN rows): shard-file loads=$loads " +
        f"bytes=${bytes / 1024 / 1024} MB wall=$sec%.2f s")
    }
    capStats("cap unrouted", routed = false)
    capStats("cap routed  ", routed = true)
    BloomProbe.setBudgetForTest(None)

    val plan = arm(routed = true).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator
      .filter(l => l.contains("Exchange") || l.contains("bloom_might_contain")
        || l.contains("Join"))
      .map(_.trim.take(110)).mkString("\n  ")
    println(s"[probe] routed plan exchanges/probe:\n  $plan")
    spark.stop()
    (shm.toSeq :+ java.nio.file.Paths.get(root)).foreach { p =>
      import scala.jdk.CollectionConverters._
      try Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(q => Files.deleteIfExists(q))
      catch { case _: Exception => () }
    }
  }
}
