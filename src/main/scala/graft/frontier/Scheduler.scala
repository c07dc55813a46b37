package graft.frontier

import graft.functions.GraftFunctions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Epoch scheduler: frontier → canonicalize/hash → in-epoch dedupe →
  * seen-set dedupe → robots gate → per-host politeness budget → deterministic
  * crawl order.
  *
  * Determinism rule (SURVEY §7.4.2): order is defined entirely by DATA —
  * `(priority DESC, url_hash ASC)` globally and within hosts — never by
  * partition iteration order, so the schedule is byte-identical at any
  * parallelism (the north rule's N vs 4N equality).
  *
  * Skew rule: the politeness top-N is computed in two phases — first within
  * `(host, salt)` sub-partitions (salt = url_hash mod `saltBuckets`), keeping
  * at most `budget` rows per sub-partition, then exactly within `host` on the
  * massively reduced survivor set. A hot host with 10^8 frontier rows costs
  * 16 parallel tasks of 10^8/16 rows instead of one task of 10^8 (the
  * reference's analog was launch-stagger, SURVEY §4 R9 — ours is data-level).
  */
object Scheduler {

  /** Normalize a raw frontier of (url, priority) into
    * (url, canon_url, host, url_hash, priority), deduplicating identical
    * canonical URLs (max priority wins; min raw url as stable witness). */
  def normalize(frontier: DataFrame): DataFrame = {
    GraftFunctions.register(frontier.sparkSession)
    // `retries` (per-URL retry budget, reference retry_warc.py:54-57) rides
    // along when the frontier carries it; plain (url, priority) frontiers
    // stay two-column.
    val aggs = Seq(max(col("priority")).as("priority"), min(col("url")).as("url")) ++
      (if (frontier.columns.contains("retries"))
        Seq(max(col("retries")).as("retries")) else Nil)
    // Fused url_key: one canonicalization per row instead of three (the
    // separate canon/host/hash expressions each re-parsed the raw URL).
    // __k stays in its own projection so CollapseProject cannot duplicate
    // the kernel per field reference (the __lic/__chk discipline).
    frontier
      .select(col("*"), GraftFunctions.urlKey(col("url")).as("__k"))
      .select(col("*"),
        col("__k").getField("canon_url").as("canon_url"),
        col("__k").getField("host").as("host"),
        col("__k").getField("url_hash").as("url_hash"))
      .drop("__k")
      .groupBy(col("canon_url"), col("host"), col("url_hash"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Broadcast cap for the robots gate, in hosts. "Per-host" is NOT tiny at
    * the target scale: a 10^10-URL frontier implies ~10^8 hosts, and the
    * robots cache stores every host's verdict including negative entries —
    * a forced broadcast there is a multi-GB driver/executor OOM. */
  def robotsBroadcastMax(spark: SparkSession): Long =
    graft.core.GraftConf.longKnob(spark,
      "graft.bcastRobotsMax", "SPARK_GRAFT_BCAST_ROBOTS_MAX", 4000000L)

  /** robots gate: drop rows whose canonical path starts with any disallowed
    * prefix for the host. `robots` = (host, disallowed array<string>).
    *
    * Join discipline (same as the fetch join in CrawlEpoch): broadcast ONLY
    * when the robots host count is known to fit under
    * [[robotsBroadcastMax]]; otherwise (including `robotsHosts` unknown =
    * `Long.MaxValue`, the safe default) leave the join unhinted — a plain
    * hash join on `host` at scale, while AQE still runtime-converts to
    * broadcast when the robots side turns out genuinely small. Either path
    * produces the identical schedule: the join is the same left join, only
    * the physical strategy differs. */
  def applyRobots(frontier: DataFrame, robots: DataFrame,
      robotsHosts: Long = Long.MaxValue): DataFrame = {
    val gate =
      if (robotsHosts <= robotsBroadcastMax(frontier.sparkSession)) broadcast(robots)
      else robots
    val path = regexp_replace(col("canon_url"), "^[a-z]+://[^/]*", "")
    frontier
      .join(gate, Seq("host"), "left")
      .withColumn("__path", path)
      .filter(col("disallowed").isNull ||
        !exists(col("disallowed"), d => col("__path").startsWith(d)))
      .drop("disallowed", "__path")
  }

  /** Per-host politeness budget via salted two-phase top-N (see class doc). */
  def politenessSelect(frontier: DataFrame, budgetPerHost: Int,
      saltBuckets: Int = 16): DataFrame = {
    val salt = pmod(col("url_hash"), lit(saltBuckets))
    val w1 = Window.partitionBy(col("host"), salt)
      .orderBy(col("priority").desc, col("url_hash"))
    val w2 = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc, col("url_hash"))
    frontier
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= budgetPerHost)
      .drop("__r1")
      .withColumn("host_rank", row_number().over(w2))
      .filter(col("host_rank") <= budgetPerHost)
  }

  /** Full epoch schedule. Output carries `host_rank` (politeness slot within
    * the host) and is totally ordered by `(priority DESC, url_hash)` — the
    * crawl order contract. */
  def scheduleEpoch(
      rawFrontier: DataFrame,
      seenSet: SeenSet,
      robots: Option[DataFrame],
      budgetPerHost: Int,
      robotsHosts: Long = Long.MaxValue): DataFrame =
    scheduleFromNormalized(normalize(rawFrontier), seenSet, robots,
      budgetPerHost, robotsHosts, persisted = false)

  /** [[scheduleEpoch]] over an already-[[normalize]]d frontier. With
    * `persisted = true` the caller guarantees `normalized` is cached
    * (CrawlEpoch does), enabling the keys-side prune of the seen-set
    * anti-join ([[SeenSet.filterUnseenPersisted]]) — at 10^10 keys that
    * keeps the key table out of the exchange entirely. */
  def scheduleFromNormalized(
      normalized: DataFrame,
      seenSet: SeenSet,
      robots: Option[DataFrame],
      budgetPerHost: Int,
      robotsHosts: Long,
      persisted: Boolean,
      frontierRows: Long = Long.MaxValue): DataFrame = {
    // frontierRows: manifest-exact upper bound on the frontier's rows (the
    // normalized frame only dedupes, never grows) — lets the keys-side
    // prune skip its gating count job; MaxValue = unknown, count as before
    val unseen =
      if (persisted) seenSet.filterUnseenPersisted(normalized, frontierRows)
      else seenSet.filterUnseen(normalized)
    val allowed = robots.fold(unseen)(applyRobots(unseen, _, robotsHosts))
    val base = Seq(col("url"), col("canon_url"), col("host"), col("url_hash"),
      col("priority"), col("host_rank"))
    val cols = if (normalized.columns.contains("retries")) base :+ col("retries") else base
    politenessSelect(allowed, budgetPerHost).select(cols: _*)
  }
}
