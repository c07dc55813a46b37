package graft.frontier

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.table.SnapshotTable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** The URL-seen set: an exact key table (snapshot-committed parquet of
  * `url_hash: long`) fronted by a PARTITIONED Bloom filter — `ShardCount`
  * sidecar filters, shard = url_hash mod ShardCount.
  *
  * Scale shape (north rule "partitioned Bloom-filter URL-seen set"): at a
  * 10^10-key frontier a single 1%-fpp filter is ~12 GB — unbroadcastable.
  * Sharding bounds each sidecar to total/ShardCount, all shards are built in
  * ONE aggregation job (per-partition build → treeReduce bitwise merge), and
  * probes load only the shards their rows touch through a per-executor cache
  * — no driver materialization, no broadcast.
  *
  * Membership discipline (reference J1 exactness,
  * `db_containment_annotator_single.py:50-67`):
  *   - `mightContain == false` ⇒ definitely unseen → kept with NO join work;
  *   - `mightContain == true` ⇒ maybe seen → confirmed by an exact
  *     `left_anti` join, so no URL is ever falsely dropped.
  *
  * Bloom sidecars are insert-only (epoch replays are no-ops); rollback =
  * snapshot-pointer flip ([[rollbackTo]], sidecars are per-snapshot); the
  * [[CuckooFilter]] covers intra-epoch single-key deletes.
  */
final class SeenSet(root: String, spark: SparkSession) {

  import SeenSet.ShardCount

  val table = new SnapshotTable(root, spark)

  private def bloomPath(id: Long, shard: Int) =
    Paths.get(root, "snapshots", s"bloom-v$id-s$shard.bin")

  def isEmpty: Boolean = !table.exists

  def keys(): DataFrame =
    if (table.exists) table.read().select(col("url_hash"))
    else spark.range(0).select(col("id").as("url_hash"))

  /** Add `urlHashes` (column `url_hash`) and commit a new snapshot + sharded
    * Bloom sidecars. Idempotent under replay: the union is distinct.
    *
    * @param expectedAdds upper bound on new keys (e.g. the scheduled-set
    *        manifest count) — sizes the filters WITHOUT a count job;
    *        overestimating only lowers the fpp.
    */
  def add(urlHashes: DataFrame, lineage: Map[String, String] = Map.empty,
      expectedAdds: Option[Long] = None): Long = {
    val prevCount = table.currentSnapshotId
      .flatMap(id => table.manifest(id)).map(_.get("row_count").asLong).getOrElse(0L)
    val merged =
      (if (table.exists) table.read().select(col("url_hash")).unionByName(urlHashes.select(col("url_hash")))
       else urlHashes.select(col("url_hash"))).distinct()
    merged.cache()
    try {
      val n = math.max(1000L,
        expectedAdds.map(_ + prevCount).getOrElse(merged.count()))
      val perShard = math.max(1000L, n / ShardCount)
      // all shards in one job: build per input partition, bitwise-OR merge
      import spark.implicits._
      val blooms = merged.as[Long].rdd
        .mapPartitions { it =>
          val arr = Array.fill(ShardCount)(BloomFilter.create(perShard, 0.01))
          it.foreach(h => arr(SeenSet.shardOf(h)).putLong(h))
          Iterator(arr)
        }
        .treeReduce { (a, b) =>
          var i = 0
          while (i < ShardCount) { a(i).mergeInPlace(b(i)); i += 1 }
          a
        }
      val id = table.commit(merged, lineage)
      blooms.zipWithIndex.foreach { case (bf, shard) =>
        val out = new java.io.ByteArrayOutputStream()
        bf.writeTo(out)
        val tmp = Paths.get(root, "snapshots", s"bloom-v$id-s$shard.bin.tmp")
        Files.write(tmp, out.toByteArray)
        Files.move(tmp, bloomPath(id, shard), StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      }
      id
    } finally merged.unpersist()
  }

  /** Roll the seen set back to an earlier snapshot (epoch rollback). The
    * Bloom sidecars are per-snapshot, so the pointer flip restores the exact
    * earlier filters too — deletion without tombstones. */
  def rollbackTo(snapshotId: Long): Unit = {
    require(table.manifest(snapshotId).isDefined, s"no snapshot $snapshotId")
    val curTmp = Paths.get(root, "snapshots", "current.tmp")
    Files.write(curTmp, snapshotId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(curTmp, Paths.get(root, "snapshots", "current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def shardsPresent(id: Long): Boolean =
    (0 until ShardCount).forall(s => Files.exists(bloomPath(id, s)))

  /** Rows of `frontier` whose `url_hash` is NOT in the seen set. */
  def filterUnseen(frontier: DataFrame): DataFrame = {
    if (isEmpty) return frontier
    table.currentSnapshotId match {
      case Some(id) if shardsPresent(id) =>
        val rootC = root
        val mightContain = udf((h: Long) =>
          SeenSet.shardFilter(rootC, id, SeenSet.shardOf(h)).mightContainLong(h))
        val definitelyNew = frontier.filter(!mightContain(col("url_hash")))
        val maybes = frontier.filter(mightContain(col("url_hash")))
          .join(keys(), Seq("url_hash"), "left_anti")
        definitelyNew.unionByName(maybes)
      case _ =>
        frontier.join(keys(), Seq("url_hash"), "left_anti")
    }
  }
}

object SeenSet {

  /** Shard fan-out. Sized so one shard of a 10^10-key set stays ~750 MB at
    * 1% fpp; tasks touch only the shards their rows hash to. */
  val ShardCount: Int = 16

  def shardOf(h: Long): Int = (((h % ShardCount) + ShardCount) % ShardCount).toInt

  // per-executor lazy shard cache: (root, snapshot, shard) → filter
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, BloomFilter]()

  private[frontier] def shardFilter(root: String, id: Long, shard: Int): BloomFilter =
    cache.computeIfAbsent(s"$root#$id#$shard", _ =>
      BloomFilter.readFrom(new ByteArrayInputStream(
        Files.readAllBytes(Paths.get(root, "snapshots", s"bloom-v$id-s$shard.bin")))))
}
