package graft.frontier

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.table.SnapshotTable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** The URL-seen set: an exact key table (snapshot-committed parquet of
  * `url_hash: long`) fronted by a Bloom filter sidecar.
  *
  * Membership discipline (north rule + reference J1 exactness,
  * `db_containment_annotator_single.py:50-67`):
  *   - `mightContain == false` ⇒ definitely unseen → kept with NO join work
  *     (at a 10^10-URL frontier this short-circuits ~97% of a fresh epoch's
  *     rows for a 1%-fpp filter);
  *   - `mightContain == true` ⇒ maybe seen → confirmed by an exact
  *     `left_anti` join against the key table, so no URL is ever falsely
  *     dropped (Bloom has no false negatives, the join removes the false
  *     positives).
  *
  * The Bloom filter is insert-only, which makes epoch replays safe (re-adding
  * keys is a no-op); deletions — needed when an epoch is rolled back — go
  * through the [[CuckooFilter]] journal instead (see `deleteJournal`).
  */
final class SeenSet(root: String, spark: SparkSession) {

  val table = new SnapshotTable(root, spark)
  private def bloomPath(id: Long) = Paths.get(root, "snapshots", s"bloom-v$id.bin")

  def isEmpty: Boolean = !table.exists

  def keys(): DataFrame =
    if (table.exists) table.read().select(col("url_hash"))
    else spark.range(0).select(col("id").as("url_hash"))

  private def loadBloom(): Option[BloomFilter] =
    table.currentSnapshotId.flatMap { id =>
      val p = bloomPath(id)
      if (Files.exists(p))
        Some(BloomFilter.readFrom(new ByteArrayInputStream(Files.readAllBytes(p))))
      else None
    }

  /** Add `urlHashes` (column `url_hash`) and commit a new snapshot + Bloom
    * sidecar. Idempotent under replay: the union is distinct.
    *
    * @param expectedAdds upper bound on new keys (e.g. the scheduled-set
    *        manifest count) — sizes the Bloom filter WITHOUT a count job;
    *        overestimating only lowers the fpp.
    */
  def add(urlHashes: DataFrame, lineage: Map[String, String] = Map.empty,
      expectedAdds: Option[Long] = None): Long = {
    val prevCount = table.currentSnapshotId
      .flatMap(id => table.manifest(id)).map(_.get("row_count").asLong).getOrElse(0L)
    val merged =
      (if (table.exists) table.read().select(col("url_hash")).unionByName(urlHashes.select(col("url_hash")))
       else urlHashes.select(col("url_hash"))).distinct()
    // one pass builds both the parquet and the bloom (cache to avoid rescan)
    merged.cache()
    try {
      val n = math.max(1000L,
        expectedAdds.map(_ + prevCount).getOrElse(merged.count()))
      val bloom = merged.stat.bloomFilter("url_hash", n, 0.01)
      val id = table.commit(merged, lineage)
      val out = new ByteArrayOutputStream()
      bloom.writeTo(out)
      val tmp = Paths.get(root, "snapshots", s"bloom-v$id.bin.tmp")
      Files.write(tmp, out.toByteArray)
      Files.move(tmp, bloomPath(id), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      id
    } finally merged.unpersist()
  }

  /** Roll the seen set back to an earlier snapshot (epoch rollback). The
    * Bloom sidecar is per-snapshot, so the pointer flip restores the exact
    * earlier filter too — deletion without tombstones. The [[CuckooFilter]]
    * covers the finer-grained path (delete individual keys inside a running
    * epoch before any snapshot exists). */
  def rollbackTo(snapshotId: Long): Unit = {
    require(table.manifest(snapshotId).isDefined, s"no snapshot $snapshotId")
    val curTmp = java.nio.file.Paths.get(root, "snapshots", "current.tmp")
    Files.write(curTmp, snapshotId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(curTmp, java.nio.file.Paths.get(root, "snapshots", "current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Rows of `frontier` whose `url_hash` is NOT in the seen set. */
  def filterUnseen(frontier: DataFrame): DataFrame = {
    if (isEmpty) return frontier
    loadBloom() match {
      case Some(bloom) =>
        val bc = spark.sparkContext.broadcast(bloom)
        val mightContain = udf((h: Long) => bc.value.mightContainLong(h))
        val definitelyNew = frontier.filter(!mightContain(col("url_hash")))
        val maybes = frontier.filter(mightContain(col("url_hash")))
          .join(keys(), Seq("url_hash"), "left_anti")
        definitelyNew.unionByName(maybes)
      case None =>
        frontier.join(keys(), Seq("url_hash"), "left_anti")
    }
  }
}
