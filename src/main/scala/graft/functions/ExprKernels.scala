package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static call targets for generated code (Scala object methods compile to
  * static forwarders, so `defineCodeGen` can emit direct calls — whole-stage
  * codegen then evaluates these expressions without the CodegenFallback
  * row-boxing detour). */
object ExprKernels {

  /** Kernel twin of the HOF chain `array_distinct(transform(sequence(...),
    * i => array_join(slice(split(lower(trim(text)), "\\s+"), i, n), " ")))`
    * — byte-identical output, one call instead of a nested-lambda codegen
    * blob. Parity details preserved deliberately: Spark `trim` strips 0x20
    * only (leading '\n' etc. yields a leading empty token), `split` keeps
    * trailing empties (limit -1), whole token list joined when shorter than
    * n, first-occurrence order kept by the distinct. */
  def shingleSet(text: UTF8String, n: Int): ArrayData = {
    val toks = text.trim().toLowerCase.toString.split("\\s+", -1)
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length < n) seen.add(toks.mkString(" "))
    else {
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder()
        var j = i
        while (j < i + n) {
          if (j > i) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
    }
    val out = new Array[AnyRef](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def canonicalizeUrl(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlNormalize.canonicalize(u.toString))

  def urlHost(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlNormalize.host(u.toString))

  def registeredDomain(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlNormalize.registeredDomain(u.toString))

  def urlHash64(u: UTF8String): Long =
    UrlNormalize.urlHash64(UrlNormalize.canonicalize(u.toString))

  /** Fused frontier key: ONE canonicalization yielding
    * struct(canon_url, host, url_hash). `Scheduler.normalize` previously
    * computed the three columns through three expressions, each of which
    * re-canonicalized the raw URL — 3× the parse cost on the frontier-wide
    * stage. Byte-identical to the separate expressions by construction
    * (host = hostOfCanonical(canon), hash = urlHash64(canon)). */
  def urlKey(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val canon = UrlNormalize.canonicalize(u.toString)
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(canon),
      UTF8String.fromString(UrlNormalize.hostOfCanonical(canon)),
      UrlNormalize.urlHash64(canon))
  }

  def urlDecode(u: UTF8String): UTF8String =
    UTF8String.fromString(graft.html.LicenseFinder.percentDecode(u.toString))

  def simhash64(t: UTF8String): Long =
    TextHashing.simhash64(t.toString)

  def minhashSig(t: UTF8String, numHashes: Int, shingleSize: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextHashing.minhashSig(t.toString, numHashes, shingleSize))

  def winnowFingerprint(t: UTF8String, k: Int, window: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextHashing.winnowFingerprint(t.toString, k, window))

  /** All (i < j) pairs of `arr` as struct(a, b) rows, input order preserved.
    * Elements are copied once up front (collect_list/sort_array buffers may
    * be reused by the aggregation machinery) and shared across the pairs
    * referencing them. */
  def sortedPairs(arr: ArrayData,
      elType: org.apache.spark.sql.types.DataType): ArrayData = {
    val n = arr.numElements()
    val els = new Array[Any](n)
    var i = 0
    while (i < n) {
      els(i) =
        if (arr.isNullAt(i)) null
        else org.apache.spark.sql.catalyst.InternalRow.copyValue(arr.get(i, elType))
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(els(i), els(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def vecDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
