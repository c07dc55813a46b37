package graft

import graft.frontier.SeenSet
import graft.functions.GraftFunctions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** fpp sweep for the Bloom sidecars (developer tool, VERDICT r4 #8): fpp is
  * the residency-vs-confirm-work dial at 10^10 keys — a looser filter is
  * smaller per executor but sends more "maybe seen" rows into the exact
  * anti-join. For each fpp this builds the SAME seen set at the same shard
  * fan-out, reports total sidecar bytes, the measured false-positive rate on
  * a fresh-keys frontier (maybes that confirm unseen), and the warm
  * `filterUnseenPersisted` wall; outputs are checked identical across arms
  * (fpp never changes answers, only work).
  *
  * Env: SPARK_GRAFT_SEEN_N (default 50M), SPARK_GRAFT_FRONTIER_N (1M),
  * SPARK_GRAFT_FPPS (comma list, default "0.01,0.03"), SPARK_GRAFT_CPUS
  * (32), SPARK_GRAFT_REPS (3).
  */
object ProbeFppSweep {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val seenN = sys.env.getOrElse("SPARK_GRAFT_SEEN_N", "50000000").toLong
    val frontN = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "1000000").toLong
    val fpps = sys.env.getOrElse("SPARK_GRAFT_FPPS", "0.01,0.03")
      .split(",").map(_.trim.toDouble).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val shm = if (Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
      Some(Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "probe-fpp")) else None
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = shm.fold(builder)(p =>
      builder.config("spark.local.dir", p.toString)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val hash = call_function("url_hash64", concat(lit("http://h"), col("id")))
    // frontier: all FRESH keys — every maybe is a pure false positive, so
    // the confirm-join row count measures fpp directly
    val frontier = spark.range(frontN).select(
        call_function("url_hash64", concat(lit("http://x"), col("id")))
          .as("url_hash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    frontier.count()

    var baseline: Option[Long] = None
    fpps.foreach { f =>
      val root = shm.map(p => Files.createTempDirectory(p, s"seen-$f"))
        .getOrElse(Files.createTempDirectory(s"probe-seen-$f")).toString
      println(s"[probe] building seen set: $seenN keys at fpp=$f")
      val seen = new SeenSet(root, spark, expectedKeys = seenN, fpp = f)
      seen.add(spark.range(seenN).select(hash.as("url_hash")))
      val sidecarBytes = {
        val dir = java.nio.file.Paths.get(root, "snapshots").toFile
        dir.listFiles().filter(_.getName.matches("bloom-v\\d+-s\\d+\\.bin"))
          .map(_.length()).sum
      }
      // measured fp rate: fraction of the fresh frontier the filter flags
      val maybes = frontier.where(call_function("bloom_might_contain",
        col("url_hash"), lit(root),
        lit(seen.table.currentSnapshotId.get))).count()
      // warm filterUnseenPersisted wall (min of reps)
      def once(): Double = {
        val t0 = System.nanoTime()
        val n = seen.filterUnseenPersisted(frontier).count()
        baseline match {
          case Some(b) => require(n == b, s"output drifted across fpp arms: $n vs $b")
          case None => baseline = Some(n)
        }
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val wall = (1 to reps).map(_ => once()).min
      println(f"[probe] fpp=$f: sidecar=${sidecarBytes / 1024.0 / 1024.0}%.1f MB " +
        f"measured_fp=${maybes.toDouble / frontN}%.4f " +
        f"(maybes=$maybes of $frontN fresh) filterUnseen warm=$wall%.2f s")
    }
    println(s"[probe] outputs identical across arms: ${baseline.get} unseen rows")
    spark.stop()
    shm.foreach { p =>
      import scala.jdk.CollectionConverters._
      try Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(q => Files.deleteIfExists(q))
      catch { case _: Exception => () }
    }
  }
}
