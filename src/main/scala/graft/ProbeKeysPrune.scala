package graft

import graft.frontier.SeenSet
import graft.functions.GraftFunctions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Scale probe for the eager keys-side prune (developer tool, VERDICT r3 #6):
  * the prune's WIN case is a large accumulated seen set against a small
  * late-epoch frontier — epoch-sized bench runs have key tables the same
  * size as the frontier, where the prune measured cost-neutral. This builds
  * a seen set far larger than the frontier and times
  * `filterUnseenPersisted` with the prune on (default) vs off
  * (`SPARK_GRAFT_BCAST_MAYBES_MAX=0` semantics via conf), printing both
  * walls and the physical-plan shape of the keys side.
  *
  * Env: SPARK_GRAFT_SEEN_N (default 12M), SPARK_GRAFT_FRONTIER_N (200k),
  * SPARK_GRAFT_CPUS (32), SPARK_GRAFT_REPS (3).
  */
object ProbeKeysPrune {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val seenN = sys.env.getOrElse("SPARK_GRAFT_SEEN_N", "12000000").toLong
    val frontN = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "200000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val shm = if (Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
      Some(Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "probe-prune")) else None
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
    // url_hash values: spread over the full long range like real hashes
    // (splitmix on the index) so shards fill evenly
    val seen = new SeenSet(root, spark, expectedKeys = seenN)
    val hash = call_function("url_hash64", concat(lit("http://h"), col("id")))
    println(s"[probe] building seen set: $seenN keys")
    seen.add(spark.range(seenN).select(hash.as("url_hash")))
    // frontier: half known-seen (maybes that confirm), half fresh
    val frontier = spark.range(frontN).select(
      when(col("id") % 2 === 0,
        call_function("url_hash64", concat(lit("http://h"), col("id") * 2)))
        .otherwise(call_function("url_hash64", concat(lit("http://x"), col("id"))))
        .as("url_hash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    frontier.count()

    def run(label: String, maybesMax: String): Unit = {
      spark.conf.set("graft.bcastMaybesMax", maybesMax)
      val df = seen.filterUnseenPersisted(frontier, rowBound = frontN)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[probe] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      val joins = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .map(_.trim.take(110)).mkString("\n  ")
      println(s"[probe] $label plan joins/exchanges:\n  $joins")
      spark.conf.unset("graft.bcastMaybesMax")
    }
    run("prune ON ", Long.MaxValue.toString)
    run("prune OFF", "0")
    spark.stop()
    // always reclaim the probe's seen-set state — with or without /dev/shm
    // (a 12M-key snapshot table per run would otherwise accumulate in /tmp)
    (shm.toSeq :+ java.nio.file.Paths.get(root)).foreach { p =>
      import scala.jdk.CollectionConverters._
      try Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(q => Files.deleteIfExists(q))
      catch { case _: Exception => () }
    }
  }
}
