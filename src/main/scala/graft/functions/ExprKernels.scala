package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static call targets for generated code (Scala object methods compile to
  * static forwarders, so `defineCodeGen` can emit direct calls — whole-stage
  * codegen then evaluates these expressions without the CodegenFallback
  * row-boxing detour). */
object ExprKernels {

  def canonicalizeUrl(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlNormalize.canonicalize(u.toString))

  def urlHost(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlNormalize.host(u.toString))

  def registeredDomain(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlNormalize.registeredDomain(u.toString))

  def urlHash64(u: UTF8String): Long =
    UrlNormalize.urlHash64(UrlNormalize.canonicalize(u.toString))

  def urlDecode(u: UTF8String): UTF8String =
    UTF8String.fromString(graft.html.LicenseFinder.percentDecode(u.toString))

  def simhash64(t: UTF8String): Long =
    TextHashing.simhash64(t.toString)

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
