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
  // One-slot victim stash (Fan et al. §4): an eviction walk that exhausts
  // MaxKicks parks its final displaced fingerprint here instead of dropping
  // it — dropping would turn a previously-inserted key into a false negative.
  // While the stash is occupied the filter is "full": inserts that would need
  // another eviction walk fail cleanly.
  private var stashFp: Short = 0
  private var stashIdx: Int = -1

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

  private def stashMatches(fp: Short, i1: Int, i2: Int): Boolean =
    stashIdx >= 0 && stashFp == fp &&
      (stashIdx == i1 || stashIdx == i2 ||
        altIndex(stashIdx, stashFp) == i1 || altIndex(stashIdx, stashFp) == i2)

  /** @return false when the filter is saturated (caller must grow/spill).
    * A failed insert never corrupts existing membership: the eviction walk
    * parks its last victim in the stash, and no walk starts while the stash
    * is occupied. */
  def insert(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = index1(key)
    val i2 = altIndex(i1, fp)
    if (bucketInsert(i1, fp) || bucketInsert(i2, fp)) { count += 1; return true }
    if (stashIdx >= 0) return false // full: an eviction walk could strand a victim
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
    // walk exhausted: the displaced chain still holds every prior key except
    // the final victim f (whose candidate buckets are i and altIndex(i, f))
    // — stash it so contains()/delete() keep seeing it. The NEW key's
    // fingerprint was placed at the walk's first step, so this insert
    // succeeded; the filter is now full.
    stashFp = f
    stashIdx = i
    count += 1
    true
  }

  def contains(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = index1(key)
    val i2 = altIndex(i1, fp)
    bucketContains(i1, fp) || bucketContains(i2, fp) || stashMatches(fp, i1, i2)
  }

  /** Deletes one copy of the key's fingerprint (standard cuckoo-filter
    * semantics: only delete keys that were inserted). */
  def delete(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = index1(key)
    val i2 = altIndex(i1, fp)
    val ok = bucketRemove(i1, fp) || bucketRemove(i2, fp)
    if (ok) {
      count -= 1
      // a slot freed up: try to re-home the stashed victim
      if (stashIdx >= 0 &&
        (bucketInsert(stashIdx, stashFp) ||
          bucketInsert(altIndex(stashIdx, stashFp), stashFp))) {
        stashFp = 0; stashIdx = -1
      }
      return true
    }
    if (stashMatches(fp, i1, i2)) { stashFp = 0; stashIdx = -1; count -= 1; true }
    else false
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 8 + table.length * 2)
    bb.putInt(nBuckets)
    bb.putInt(if (stashIdx >= 0) 1 else 0)
    bb.putLong(count)
    bb.putShort(stashFp)
    bb.putShort(0)
    bb.putInt(stashIdx)
    table.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter {
  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val flags = bb.getInt
    val cnt = bb.getLong
    val f = new CuckooFilter(n)
    val sFp = bb.getShort
    bb.getShort
    val sIdx = bb.getInt
    if ((flags & 1) != 0) { f.stashFp = sFp; f.stashIdx = sIdx }
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
