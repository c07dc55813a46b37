package graft.frontier

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Executor-side access to the [[SeenSet]] Bloom sidecars.
  *
  * The cache holds AT MOST ONE filter per (root, shard): each epoch commits a
  * new seen-set snapshot, so keying by snapshot id (as round 1 did) grew one
  * full filter generation per epoch and would OOM an executor after a few
  * epochs at the ~750 MB/shard target scale. A request for a different
  * snapshot id (newer epoch, or older after a rollback) replaces the cached
  * entry for that shard.
  */
object BloomProbe {

  // (root#shard) -> (snapshotId, filter); one resident generation per shard
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, BloomFilter)]()

  private[graft] def filterFor(root: String, id: Long, shard: Int): BloomFilter = {
    val key = s"$root#$shard"
    val cur = cache.get(key)
    if (cur != null && cur._1 == id) cur._2
    else {
      val bf = BloomFilter.readFrom(new ByteArrayInputStream(
        Files.readAllBytes(Paths.get(root, "snapshots", s"bloom-v$id-s$shard.bin"))))
      cache.put(key, (id, bf)) // requested generation wins; superseded one is dropped
      bf
    }
  }

  /** Static probe entry point for generated code (whole-stage codegen calls
    * this directly — no boxing, no UDF wrapper). */
  def probe(root: String, id: Long, h: Long): Boolean =
    filterFor(root, id, SeenSet.shardOf(h)).mightContainLong(h)
}

/** `bloom_might_contain(url_hash, root, snapshot_id)` — codegen'd membership
  * probe against the sharded seen-set Bloom sidecars. Replaces round 1's
  * Scala `udf` probe (interpreted, boxed, CodegenFallback) so the probe runs
  * inside the whole-stage-codegen span of the frontier scan. `root` and
  * `snapshot_id` must be literals. */
case class BloomMightContain(hash: Expression, rootExpr: Expression, idExpr: Expression)
    extends TernaryExpression {

  override def first: Expression = hash
  override def second: Expression = rootExpr
  override def third: Expression = idExpr

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def nullable: Boolean = hash.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (hash.dataType != LongType) TypeCheckFailure("hash must be LONG")
    else if (rootExpr.dataType != StringType || !rootExpr.foldable)
      TypeCheckFailure("root must be a string literal")
    else if (idExpr.dataType != LongType || !idExpr.foldable)
      TypeCheckFailure("snapshot id must be a long literal")
    else TypeCheckSuccess
  }

  @transient private lazy val root: String = rootExpr.eval().toString
  @transient private lazy val snapId: Long = idExpr.eval().asInstanceOf[Long]

  override protected def nullSafeEval(h: Any, r: Any, i: Any): Any =
    java.lang.Boolean.valueOf(BloomProbe.probe(root, snapId, h.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rootRef = ctx.addReferenceObj("bloomRoot", root)
    defineCodeGen(ctx, ev, (h, _, _) =>
      s"graft.frontier.BloomProbe.probe($rootRef, ${snapId}L, $h)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(hash = newFirst, rootExpr = newSecond, idExpr = newThird)
}

/** Executor-side access to the [[SeenSet]] tombstone cuckoo sidecar (the
  * deletion-capable companion of the Bloom shards: retracted keys live here
  * until re-added). One resident generation per root, like [[BloomProbe]];
  * tombstone sets are epoch-delta sized, so a single unsharded filter
  * suffices (16 bits/key ⇒ 10^8 tombstones ≈ 250 MB). */
object CuckooProbe {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, CuckooFilter)]()

  private[graft] def filterFor(root: String, id: Long): CuckooFilter = {
    val cur = cache.get(root)
    if (cur != null && cur._1 == id) cur._2
    else {
      val cf = CuckooFilter.deserialize(
        Files.readAllBytes(Paths.get(root, "snapshots", s"cuckoo-v$id.bin")))
      cache.put(root, (id, cf))
      cf
    }
  }

  /** Static probe entry point for generated code. */
  def probe(root: String, id: Long, h: Long): Boolean =
    filterFor(root, id).contains(h)
}

/** `cuckoo_might_contain(url_hash, root, snapshot_id)` — codegen'd probe of
  * the tombstone cuckoo sidecar. Gates the exact tombstone anti-join in
  * [[SeenSet.liveKeys]]: keys the filter rejects are definitely not
  * retracted and skip the join. `root` and `snapshot_id` must be literals. */
case class CuckooMightContain(hash: Expression, rootExpr: Expression, idExpr: Expression)
    extends TernaryExpression {

  override def first: Expression = hash
  override def second: Expression = rootExpr
  override def third: Expression = idExpr

  override def dataType: DataType = BooleanType
  override def prettyName: String = "cuckoo_might_contain"
  override def nullable: Boolean = hash.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (hash.dataType != LongType) TypeCheckFailure("hash must be LONG")
    else if (rootExpr.dataType != StringType || !rootExpr.foldable)
      TypeCheckFailure("root must be a string literal")
    else if (idExpr.dataType != LongType || !idExpr.foldable)
      TypeCheckFailure("snapshot id must be a long literal")
    else TypeCheckSuccess
  }

  @transient private lazy val root: String = rootExpr.eval().toString
  @transient private lazy val snapId: Long = idExpr.eval().asInstanceOf[Long]

  override protected def nullSafeEval(h: Any, r: Any, i: Any): Any =
    java.lang.Boolean.valueOf(CuckooProbe.probe(root, snapId, h.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rootRef = ctx.addReferenceObj("cuckooRoot", root)
    defineCodeGen(ctx, ev, (h, _, _) =>
      s"graft.frontier.CuckooProbe.probe($rootRef, ${snapId}L, $h)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(hash = newFirst, rootExpr = newSecond, idExpr = newThird)
}
