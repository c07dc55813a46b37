package graft

import graft.frontier.{BloomProbe, SeenSet, ShardMeta, ShardRoute}

import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Pins SHARD-ROUTED seen-probing (VERDICT r4 #2): ShardCount as a
  * first-build parameter recorded per root, the purity-preserving custom
  * routing, and the routed filterUnseen's exactness + plan shape. */
class ShardRouteSpec extends SparkSpecBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // --- ShardMeta: the per-root fan-out record --------------------------------

  test("shard meta: record wins for the root's life; conflicting rebuild fails fast") {
    val root = tmpDir("shardmeta")
    assert(!ShardMeta.isRecorded(root))
    // missing record = legacy layout = the historical constant 16
    assert(ShardMeta.countFor(tmpDir("shardmeta-legacy")) === 16)
    ShardMeta.record(root, 8)
    assert(ShardMeta.isRecorded(root))
    assert(ShardMeta.countFor(root) === 8)
    ShardMeta.record(root, 8) // idempotent
    // geometry is fixed at first build: OR-merge + file layout + probe
    // routing all read this value — silently changing it would corrupt all
    val e = intercept[IllegalStateException](ShardMeta.record(root, 16))
    assert(e.getMessage.contains("shard-count mismatch"))
    assert(ShardMeta.countFor(root) === 8)
  }

  // --- ShardRoute: exact-purity repartitioning --------------------------------

  test("representatives: rep(p) hashes onto partition p under Spark's HashPartitioning") {
    for (n <- Seq(1, 4, 32, 100)) {
      val reps = ShardRoute.representatives(n)
      reps.zipWithIndex.foreach { case (v, p) =>
        val h = Murmur3Hash(Seq(Literal(v)), 42).eval(null).asInstanceOf[Int]
        assert(((h % n) + n) % n === p, s"rep($p)=$v lands elsewhere at n=$n")
      }
    }
  }

  test("routeByShard: every task sees ONE shard, slots actually spread (gcd hazard)") {
    import spark.implicits._
    val S = 16
    val slots = 2 // gcd(16, 2) = 2: the naive slot = hash % slots would
    // collapse each shard onto ONE slot (within a shard, hash ≡ shard mod S
    // pins the low bit) — half the routed parallelism silently unused
    val rows = (0L until 20000L).map(i =>
      graft.functions.TextHashing.splitmix64(i)) // arbitrary signs/bits
    val df = rows.toDF("url_hash")
    val routed = ShardRoute.routeByShard(df, "url_hash", S, slots)
    val perPart = routed.select("url_hash").rdd.mapPartitionsWithIndex {
      (pid, it) =>
        val shards = it.map(r => SeenSet.shardOf(r.getLong(0), S)).toSet
        Iterator((pid, shards))
    }.collect()
    assert(perPart.length === S * slots, "REPARTITION_BY_NUM count (AQE must not coalesce)")
    perPart.foreach { case (pid, shards) =>
      assert(shards.size <= 1, s"partition $pid mixes shards $shards")
    }
    val nonEmpty = perPart.filter(_._2.nonEmpty)
    assert(nonEmpty.flatMap(_._2).toSet.size === S, "every shard routed somewhere")
    // Murmur3-based slot: expect ~all S*slots partitions populated; the gcd
    // hazard would cap this at exactly S
    assert(nonEmpty.length > S + S / 2,
      s"slots unused (${nonEmpty.length} non-empty of ${S * slots}): gcd hazard")
    // routing only MOVES rows
    assert(routed.as[Long].collect().sorted.toSeq === rows.sorted)
  }

  // --- SeenSet: fan-out as a first-build parameter ----------------------------

  test("seen set: constructor shardCount builds that many sidecar shards; recorded value wins later") {
    import spark.implicits._
    val root = tmpDir("seenS4")
    val seen = new SeenSet(root, spark, shardCount = 4)
    seen.add((0L until 2000L).toDF("url_hash"))
    assert(ShardMeta.countFor(root) === 4)
    val shardIds = Files.list(Paths.get(root, "snapshots")).toArray.toSeq
      .map(_.toString.split('/').last)
      .collect { case n if n.matches("bloom-v\\d+-s\\d+\\.bin") =>
        n.replaceAll(".*-s(\\d+)\\.bin", "$1").toInt }
    assert(shardIds.nonEmpty && shardIds.max === 3 && shardIds.min === 0,
      s"expected shards 0..3, got $shardIds")
    // a later instance asking for a DIFFERENT fan-out on this root gets the
    // recorded one (geometry never changes mid-chain) — membership stays exact
    val seen2 = new SeenSet(root, spark, shardCount = 64)
    seen2.add((2000L until 2500L).toDF("url_hash"))
    val out = seen2.filterUnseen((1000L until 3000L).toDF("url_hash"))
    assert(out.as[Long].collect().sorted.toSeq === (2500L until 3000L).toSeq)
    assert(ShardMeta.countFor(root) === 4)
  }

  test("fpp is a recorded first-build parameter: geometry fixed, membership exact either way") {
    import spark.implicits._
    val rootLoose = tmpDir("seenFpp")
    val loose = new SeenSet(rootLoose, spark, shardCount = 4, fpp = 0.2)
    loose.add((0L until 3000L).toDF("url_hash"))
    val meta = new String(java.nio.file.Files.readAllBytes(
      Paths.get(rootLoose, "snapshots", "bloom-meta.json")))
    assert(meta.contains("\"fpp\":0.2"), s"fpp not recorded: $meta")
    // a later instance asking for a different fpp gets the recorded one
    // (OR-merge needs identical bit geometry); membership stays exact
    val later = new SeenSet(rootLoose, spark, shardCount = 4, fpp = 0.001)
    later.add((3000L until 3500L).toDF("url_hash"))
    val out = later.filterUnseen((2000L until 4000L).toDF("url_hash"))
    assert(out.as[Long].collect().sorted.toSeq === (3500L until 4000L).toSeq)
    // tighter-fpp root is strictly larger on disk for the same keys
    def sidecarBytes(r: String): Long =
      java.nio.file.Files.list(Paths.get(r, "snapshots")).toArray.toSeq
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.matches("bloom-v\\d+-s\\d+\\.bin"))
        .map(java.nio.file.Files.size).sum
    val rootTight = tmpDir("seenFppTight")
    val tight = new SeenSet(rootTight, spark, shardCount = 4, fpp = 0.001)
    tight.add((0L until 3000L).toDF("url_hash"))
    assert(sidecarBytes(rootTight) > sidecarBytes(rootLoose),
      "tighter fpp must cost more filter bytes")
  }

  test("filterUnseenRouted: byte-equal rows, one shard per task, probe in a post-exchange stage") {
    import spark.implicits._
    val root = tmpDir("seenRoute")
    val seen = new SeenSet(root, spark, shardCount = 8)
    seen.add((0L until 4000L).toDF("url_hash"))
    val frontier = (2000L until 6000L).toDF("url_hash")
    val routed = seen.filterUnseenRouted(frontier, slotsPerShard = 2)
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"probe missing:\n$plan")
    assert(plan.contains("Exchange"), s"routing exchange missing:\n$plan")
    // exactness first (routing only moves rows), OUTSIDE the tracking
    // window — the unrouted arm's tasks legitimately mix shards
    assert(routed.as[Long].collect().sorted.toSeq ===
      seen.filterUnseen(frontier).as[Long].collect().sorted.toSeq)
    assert(routed.as[Long].collect().sorted.toSeq === (4000L until 6000L).toSeq)
    BloomProbe.trackTouches = true
    BloomProbe.resetTracking()
    try {
      routed.count()
      import scala.jdk.CollectionConverters._
      val shardsPerTask = BloomProbe.touches.asScala.toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
      assert(shardsPerTask.nonEmpty, "no probe touches recorded")
      // the whole point: unrouted, tasks fault in ~every shard; routed,
      // per-task resident filter bytes are totalBytes / shardCount
      shardsPerTask.foreach { case (task, n) =>
        assert(n === 1, s"task $task touched $n shards (routing leaked)")
      }
    } finally {
      BloomProbe.trackTouches = false
      BloomProbe.resetTracking()
    }
  }
}
