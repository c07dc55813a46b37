package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL normalization for the frontier (north rule: "bloom/cuckoo URL-seen set
  * over canonicalized+hashed URLs"). Pure deterministic string logic — no
  * network, no JDK URL parsing (which is locale/IDN dependent).
  */
object UrlNormalize {

  /** Deterministic canonical form:
    *   - trim; add "http://" if scheme-less
    *   - scheme + host lowercased; trailing host dot dropped
    *   - default ports stripped (http:80 / https:443)
    *   - fragment dropped; empty path → "/"
    *   - percent-escapes of unreserved chars decoded, others uppercased
    *   - query preserved (order untouched: semantics may depend on it)
    */
  def canonicalize(rawUrl: String): String = {
    var url = rawUrl.trim
    if (url.isEmpty) return url
    val schemeEnd = url.indexOf("://")
    val (scheme, rest) =
      if (schemeEnd > 0 && schemeEnd <= 8) (url.substring(0, schemeEnd).toLowerCase, url.substring(schemeEnd + 3))
      else ("http", url)
    val fragIdx = rest.indexOf('#')
    val noFrag = if (fragIdx >= 0) rest.substring(0, fragIdx) else rest
    val pathIdx = {
      val slash = noFrag.indexOf('/')
      val q = noFrag.indexOf('?')
      if (slash < 0 && q < 0) noFrag.length
      else if (slash < 0) q
      else if (q >= 0 && q < slash) q
      else slash
    }
    var hostPort = noFrag.substring(0, pathIdx).toLowerCase.stripSuffix(".")
    var pathQuery = noFrag.substring(pathIdx)
    // strip userinfo (rare; normalize away for seen-set identity)
    val at = hostPort.lastIndexOf('@')
    if (at >= 0) hostPort = hostPort.substring(at + 1)
    val host =
      if (hostPort.endsWith(":80") && scheme == "http") hostPort.dropRight(3)
      else if (hostPort.endsWith(":443") && scheme == "https") hostPort.dropRight(4)
      else hostPort
    if (pathQuery.isEmpty || pathQuery.startsWith("?")) pathQuery = "/" + pathQuery
    s"$scheme://$host${normalizeEscapes(pathQuery)}"
  }

  private def isUnreserved(b: Int): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9') ||
      b == '-' || b == '.' || b == '_' || b == '~'

  /** Decode %XX of unreserved characters, uppercase the hex of the rest. */
  def normalizeEscapes(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%').append(s.substring(i + 1, i + 3).toUpperCase)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Host of an ALREADY-canonical URL (port normalized away for defaults). */
  def hostOfCanonical(canon: String): String = {
    val start = canon.indexOf("://") + 3
    val end0 = canon.indexOf('/', start)
    val end = if (end0 < 0) canon.length else end0
    val h = canon.substring(start, end)
    val colon = h.indexOf(':')
    if (colon >= 0) h.substring(0, colon) else h
  }

  /** Host of a raw URL. */
  def host(rawUrl: String): String = hostOfCanonical(canonicalize(rawUrl))

  /** Multi-label public suffixes we special-case (embedded subset of the
    * public-suffix list — enough for the corpus + common real domains;
    * reference uses tldextract, `scripts/post_processing/remove_copyrighted_domains.py:15`). */
  private val MultiSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.nz", "net.nz", "org.nz",
    "co.in", "net.in", "org.in", "ac.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.za", "co.kr", "or.kr")

  /** Registered domain `{domain}.{suffix}` (tldextract semantics for the
    * embedded suffix subset); IPs and single-label hosts returned whole. */
  def registeredDomain(rawUrl: String): String = {
    val h = host(rawUrl)
    val labels = h.split('.')
    if (labels.length <= 2) return h
    if (labels.forall(l => l.nonEmpty && l.forall(_.isDigit))) return h // IPv4
    val lastTwo = labels.takeRight(2).mkString(".")
    if (MultiSuffixes.contains(lastTwo) && labels.length >= 3)
      labels.takeRight(3).mkString(".")
    else lastTwo
  }

  // one digest per thread: MessageDigest.getInstance does a provider lookup
  // and allocation per call, measurable at frontier rates
  private val sha256Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  /** 64-bit key for the seen-set: first 8 bytes (big-endian) of SHA-256 of the
    * canonical URL. Stable across JVMs/partitions; collision odds at 10^10
    * keys ≈ 10^10²/2^65 ≈ 0.3% for one collision anywhere — the seen-set join
    * also carries the canonical URL for exactness. */
  def urlHash64(canonicalUrl: String): Long = {
    val md = sha256Local.get()
    md.reset()
    val d = md.digest(canonicalUrl.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }
}

case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "canonicalize_url"
  override def nullSafeEval(input: Any): Any =
    ExprKernels.canonicalizeUrl(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.canonicalizeUrl($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_host"
  override def nullSafeEval(input: Any): Any =
    ExprKernels.urlHost(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.urlHost($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RegisteredDomain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "registered_domain"
  override def nullSafeEval(input: Any): Any =
    ExprKernels.registeredDomain(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.registeredDomain($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused frontier key — struct(canon_url, host, url_hash) from ONE
  * canonicalization pass (see [[ExprKernels.urlKey]]). */
case class UrlKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("canon_url", StringType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("url_hash", LongType, nullable = false)))
  override def prettyName: String = "url_key"
  override def nullSafeEval(input: Any): Any =
    ExprKernels.urlKey(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.urlKey($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** sha256-based 64-bit url key (applies canonicalization first). */
case class UrlHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "url_hash64"
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(ExprKernels.urlHash64(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.urlHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
