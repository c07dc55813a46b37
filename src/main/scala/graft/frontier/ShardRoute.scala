package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.functions._

/** SHARD-ROUTED probing support: repartition a frontier so that EVERY TASK
  * probes exactly ONE Bloom/cuckoo shard.
  *
  * Why: the probe expressions ([[BloomMightContain]]) load shard files into
  * a per-executor cache. Unrouted, a frontier partition's `url_hash`es are
  * arbitrary, so every task faults in every shard — at a 10^10-key seen set
  * (~12 GB of filter across the family) every executor eventually holds the
  * FULL family resident, and a byte-capped cache ([[ProbeCacheBudget]])
  * thrashes because consecutive rows hit different shards. Routed, a task's
  * rows all hash to one shard: resident bytes per task =
  * `totalFilterBytes / shardCount`, and a cache capped at a couple of shards
  * never thrashes. The cost is one exchange of the frontier — 8-byte hash +
  * its row — which the 100-TB shape pays anyway for politeness grouping.
  *
  * Partition PURITY with parallelism above the shard count: target partition
  * `p = shard * slotsPerShard + slot`, where `slot` spreads a shard's rows
  * over `slotsPerShard` tasks. `slot` must NOT be `hash % slots` (the naive
  * formula): within a shard `hash ≡ shard (mod S)`, so whenever
  * `gcd(S, slots) = g > 1` only `slots/g` slots are ever hit (at S=16,
  * slots=2 an entire shard lands on ONE task). We use Spark's Murmur3
  * `hash()` of the url_hash instead — independent of the low bits the shard
  * id consumes.
  *
  * HOW the routing stays DataFrame-native: Spark's `repartition(N, expr)`
  * places a row at `pmod(murmur3(expr, seed=42), N)` — not directly
  * programmable. Instead of a custom RDD partitioner (which would leave the
  * codegen'd/UnsafeRow exchange path), we precompute one REPRESENTATIVE KEY
  * per target partition: `reps(p)` is a long whose Murmur3 hash lands on
  * partition `p`. Each row computes its target partition id, looks up the
  * representative in a constant array literal, and repartitions on that —
  * the native shuffle then delivers exact purity. An explicit-N repartition
  * is a `REPARTITION_BY_NUM` shuffle, which AQE never coalesces, so purity
  * survives adaptive re-planning.
  */
object ShardRoute {

  /** `reps(p)` = a long `v` with `pmod(Murmur3Hash(v, 42), n) == p`, found by
    * scanning v = 0,1,2,… (coupon-collector, ~n·ln n hashes — driver-side,
    * microseconds at any realistic n). Memoized per n. */
  private val repsCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private[graft] def representatives(n: Int): Array[Long] =
    repsCache.computeIfAbsent(n, _ => {
      val reps = new Array[Long](n)
      val found = new Array[Boolean](n)
      var remaining = n
      var v = 0L
      while (remaining > 0) {
        // identical to HashPartitioning's routing of a single long column
        val h = Murmur3Hash(Seq(Literal(v)), 42).eval(null).asInstanceOf[Int]
        val p = ((h % n) + n) % n
        if (!found(p)) { found(p) = true; reps(p) = v; remaining -= 1 }
        v += 1
      }
      reps
    })

  /** The target-partition id column: `shard * slotsPerShard + slot`. */
  private def routeId(hashCol: Column, shardCount: Int, slotsPerShard: Int): Column =
    (pmod(hashCol, lit(shardCount.toLong)) * slotsPerShard +
      pmod(hash(hashCol), lit(slotsPerShard))).cast("int")

  /** Repartition `df` into `shardCount * slotsPerShard` partitions such that
    * every partition's `hashColName` values belong to ONE shard
    * (`shardOf(h, shardCount)` constant per partition). Row set unchanged. */
  def routeByShard(df: DataFrame, hashColName: String, shardCount: Int,
      slotsPerShard: Int): DataFrame = {
    require(shardCount > 0 && slotsPerShard > 0,
      s"positive fan-out required: shardCount=$shardCount slots=$slotsPerShard")
    val n = shardCount * slotsPerShard
    val reps = representatives(n)
    df.withColumn("__route",
        element_at(typedlit(reps.toSeq),
          routeId(col(hashColName), shardCount, slotsPerShard) + 1))
      .repartition(n, col("__route"))
      .drop("__route")
  }
}
