package graft.frontier

import graft.functions.TextHashing.splitmix64

/** Deterministic cuckoo filter (Fan et al., CoNEXT'14): 16-bit fingerprints,
  * 4-slot buckets, partial-key cuckoo hashing. The deletion-capable fallback
  * for the URL-seen set demanded by the north rule (a Bloom filter cannot
  * delete; the crawl needs deletes when a seen URL is re-queued after a
  * failed fetch epoch is rolled back).
  *
  * All randomness (eviction choice) is derived from a splitmix64 counter, so
  * filter state after a fixed insert sequence is identical everywhere.
  */
final class CuckooFilter(val nBuckets: Int) extends Serializable {
  require((nBuckets & (nBuckets - 1)) == 0, "nBuckets must be a power of two")

  private val BucketSize = 4
  private val MaxKicks = 500
  private val table = new Array[Short](nBuckets * BucketSize)
  private var evictionCounter = 0L
  private var count = 0L

  def size: Long = count

  private def fingerprint(key: Long): Short = {
    val f = (splitmix64(key) & 0xffffL).toShort
    if (f == 0) 1.toShort else f
  }

  private def index1(key: Long): Int =
    (splitmix64(key ^ 0x5bd1e995L).toInt & (nBuckets - 1))

  private def altIndex(i: Int, fp: Short): Int =
    (i ^ splitmix64(fp.toLong & 0xffffL).toInt) & (nBuckets - 1)

  private def bucketInsert(i: Int, fp: Short): Boolean = {
    var s = 0
    while (s < BucketSize) {
      if (table(i * BucketSize + s) == 0) { table(i * BucketSize + s) = fp; return true }
      s += 1
    }
    false
  }

  private def bucketContains(i: Int, fp: Short): Boolean = {
    var s = 0
    while (s < BucketSize) {
      if (table(i * BucketSize + s) == fp) return true
      s += 1
    }
    false
  }

  private def bucketRemove(i: Int, fp: Short): Boolean = {
    var s = 0
    while (s < BucketSize) {
      if (table(i * BucketSize + s) == fp) { table(i * BucketSize + s) = 0; return true }
      s += 1
    }
    false
  }

  /** @return false when the filter is saturated (caller must grow/spill) */
  def insert(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = index1(key)
    val i2 = altIndex(i1, fp)
    if (bucketInsert(i1, fp) || bucketInsert(i2, fp)) { count += 1; return true }
    // deterministic eviction walk
    var i = if ((splitmix64(evictionCounter) & 1L) == 0L) i1 else i2
    var f = fp
    var kicks = 0
    while (kicks < MaxKicks) {
      evictionCounter += 1
      val slot = (splitmix64(evictionCounter) & 0x3L).toInt
      val victim = table(i * BucketSize + slot)
      table(i * BucketSize + slot) = f
      f = victim
      i = altIndex(i, f)
      if (bucketInsert(i, f)) { count += 1; return true }
      kicks += 1
    }
    false
  }

  def contains(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = index1(key)
    bucketContains(i1, fp) || bucketContains(altIndex(i1, fp), fp)
  }

  /** Deletes one copy of the key's fingerprint (standard cuckoo-filter
    * semantics: only delete keys that were inserted). */
  def delete(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = index1(key)
    val ok = bucketRemove(i1, fp) || bucketRemove(altIndex(i1, fp), fp)
    if (ok) count -= 1
    ok
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + table.length * 2)
    bb.putInt(nBuckets)
    bb.putInt(0)
    bb.putLong(count)
    table.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter {
  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    bb.getInt
    val cnt = bb.getLong
    val f = new CuckooFilter(n)
    var i = 0
    while (i < n * 4) { f.table(i) = bb.getShort; i += 1 }
    f.count = cnt
    f
  }

  /** Capacity for a target element count at ~95% load. */
  def forCapacity(n: Long): CuckooFilter = {
    var buckets = 1
    while (buckets.toLong * 4 * 95 / 100 < n) buckets <<= 1
    new CuckooFilter(buckets)
  }
}
