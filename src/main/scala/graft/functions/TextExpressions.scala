package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text hashing/sketching primitives for the dedup stage
  * (MinHash signatures, SimHash, winnowing fingerprints). All hashing is
  * pure-Scala (FNV-1a 64 + splitmix64 mixing) — stable across JVMs,
  * partitions, and cluster sizes, which the north rule's cross-parallelism
  * equality test requires.
  */
object TextHashing {

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Unicode-whitespace tokenization, lowercased. */
  def tokens(text: String): Array[String] =
    text.trim.toLowerCase.split("(?U)\\s+").filter(_.nonEmpty)

  /** Word n-gram shingles joined with a single space. */
  def shingles(text: String, n: Int): Array[String] = {
    val ts = tokens(text)
    if (ts.length < n) {
      if (ts.isEmpty) Array.empty else Array(ts.mkString(" "))
    } else
      Array.tabulate(ts.length - n + 1)(i => ts.slice(i, i + n).mkString(" "))
  }

  // fixed universal-hash coefficients, computed once per JVM
  private val MaxK = 256
  private lazy val hashAs: Array[Long] = Array.tabulate(MaxK)(i => splitmix64(2L * i + 1) | 1L)
  private lazy val hashBs: Array[Long] = Array.tabulate(MaxK)(i => splitmix64(2L * i))

  /** MinHash signature: k permutations via universal hashing
    * h_i(x) = a_i * fnv(x) + b_i with fixed seeded (a_i odd, b_i). */
  def minhashSig(text: String, k: Int, shingleSize: Int): Array[Long] = {
    require(k <= MaxK)
    val sh = shingles(text, shingleSize)
    val sig = Array.fill(k)(Long.MaxValue)
    if (sh.isEmpty) return sig
    val as = hashAs
    val bs = hashBs
    var j = 0
    while (j < sh.length) {
      val base = fnv1a64(sh(j))
      var i = 0
      while (i < k) {
        val h = as(i) * base + bs(i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    sig
  }

  /** 64-bit SimHash over lowercased whitespace tokens (unit weights). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    val ts = tokens(text)
    var j = 0
    while (j < ts.length) {
      val h = fnv1a64(ts(j))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03): k-char
    * grams → rolling window of size w → per-window min hash (rightmost on
    * ties) → distinct sorted selected hashes. */
  def winnowFingerprint(text: String, k: Int, w: Int): Array[Long] = {
    val norm = tokens(text).mkString(" ")
    if (norm.length < k) {
      return if (norm.isEmpty) Array.empty else Array(fnv1a64(norm))
    }
    val grams = Array.tabulate(norm.length - k + 1)(i => fnv1a64(norm.substring(i, i + k)))
    if (grams.length <= w) return grams.distinct.sorted
    val selected = scala.collection.mutable.SortedSet.empty[Long]
    var start = 0
    while (start + w <= grams.length) {
      var minIdx = start
      var i = start + 1
      while (i < start + w) {
        if (grams(i) <= grams(minIdx)) minIdx = i // rightmost minimum
        i += 1
      }
      selected += grams(minIdx)
      start += 1
    }
    selected.toArray
  }
}

/** `shingle_set(text, n)` — distinct word n-gram shingles, the exact-Jaccard
  * verification tokenization of the LSH dedup pipelines (see
  * [[ExprKernels.shingleSet]] for the parity contract with the HOF chain it
  * replaces). `n` must be an integer literal. */
case class ShingleSet(child: Expression, nExpr: Expression) extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = nExpr
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"
  @transient private lazy val n: Int = nExpr.eval().asInstanceOf[Int]
  override protected def nullSafeEval(t: Any, nn: Any): Any =
    ExprKernels.shingleSet(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (t, _) => s"graft.functions.ExprKernels.shingleSet($t, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, nExpr = newRight)
}

/** The deterministic stopword-ratio language heuristic (F5 analog) as a
  * single-pass kernel: per-language stopword hit counts over one whitespace
  * tokenization, then the argmax/strict-threshold/fixed-order-tie rule.
  * Token/score semantics are IDENTICAL to the declarative tree it replaces
  * (`split(lower(trim(text)), "\\s+")` with trailing empties kept, n =
  * max(|toks|, 1), score = hits/n in double division): UTF8String.trim
  * strips 0x20 only and toLowerCase matches Spark's `lower`, exactly as
  * [[ExprKernels.shingleSet]] establishes. The HOF-aggregate shape it
  * replaces allocated a struct accumulator per TOKEN and generated the
  * largest codegen blob of the 11-stage pipeline (guide §1.2 per-task work:
  * the chain's cost was dominated by this stage's ~50 string compares +
  * allocations per token). */
object LangHeuristic {
  // canonical stopword data (MainPipeline mirrors the reference's LanguageFilter)
  val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ich", "nicht", "mit", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "dans", "que"),
    "es" -> Seq("el", "que", "de", "en", "los", "se", "del", "las", "por", "un"),
    "nl" -> Seq("de", "het", "een", "en", "van", "ik", "dat", "niet", "op", "te"))

  private val langs: Array[UTF8String] =
    langStops.map(p => UTF8String.fromString(p._1)).toArray
  private val stopSets: Array[java.util.HashSet[String]] =
    langStops.map { case (_, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray

  /** struct(language, score): language = first lang (fixed order) whose
    * score equals the max AND strictly exceeds its threshold; both fields
    * null when no language qualifies. */
  def decide(text: UTF8String, thresholds: Array[Double]): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.trim().toLowerCase.toString.split("\\s+", -1)
    val nLangs = langs.length
    val counts = new Array[Int](nLangs)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var l = 0
      while (l < nLangs) {
        if (stopSets(l).contains(t)) counts(l) += 1
        l += 1
      }
      i += 1
    }
    val n = math.max(toks.length, 1).toDouble
    var best = Double.NegativeInfinity
    var l = 0
    while (l < nLangs) {
      val s = counts(l) / n
      if (s > best) best = s
      l += 1
    }
    var picked = -1
    l = 0
    while (picked < 0 && l < nLangs) {
      val s = counts(l) / n
      if (s == best && s > thresholds(l)) picked = l
      l += 1
    }
    if (picked < 0) org.apache.spark.sql.catalyst.InternalRow(null, null)
    else org.apache.spark.sql.catalyst.InternalRow(langs(picked), counts(picked) / n)
  }
}

/** `lang_decision(text, th_en, th_de, ...)` — see [[LangHeuristic.decide]];
  * thresholds are literal doubles, one per language in fixed order. */
case class LangDecision(child: Expression, thresholds: Seq[Double])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("language", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))
  override def prettyName: String = "lang_decision"
  @transient private lazy val thArr: Array[Double] = thresholds.toArray
  override def nullSafeEval(input: Any): Any =
    LangHeuristic.decide(input.asInstanceOf[UTF8String], thArr)
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val th = ctx.addReferenceObj("thresholds", thArr)
    defineCodeGen(ctx, ev, c => s"graft.functions.LangHeuristic.decide($c, $th)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sorted_pairs(arr)` — all index pairs (i < j) of an ascending-sorted
  * array, as array<struct<a, b>> preserving the input order (so `a < b`
  * whenever the input is sorted on a unique key). The LSH dedup pipelines
  * use it to emit within-bucket candidate pairs from ONE capped members
  * array instead of a bucket self-join — which evaluated the whole
  * banding+window subtree twice and paid a join exchange (guide §2.4:
  * remove shuffles outright). Output size is bounded by the caller's
  * bucket cap (≤ cap·(cap−1)/2 per bucket). */
case class SortedPairs(child: Expression) extends UnaryExpression {
  @transient private lazy val elType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", elType, nullable = true),
    StructField("b", elType, nullable = true))), containsNull = false)
  override def prettyName: String = "sorted_pairs"
  override def nullSafeEval(input: Any): Any =
    ExprKernels.sortedPairs(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], elType)
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val et = ctx.addReferenceObj("elType", elType)
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.sortedPairs($c, $et)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashSig(child: Expression, numHashes: Int = 64, shingleSize: Int = 3)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    ExprKernels.minhashSig(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      numHashes, shingleSize)
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ExprKernels.minhashSig($c, $numHashes, $shingleSize)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(ExprKernels.simhash64(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WinnowFingerprint(child: Expression, k: Int = 5, window: Int = 4)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"
  override def nullSafeEval(input: Any): Any =
    ExprKernels.winnowFingerprint(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, window)
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ExprKernels.winnowFingerprint($c, $k, $window)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
