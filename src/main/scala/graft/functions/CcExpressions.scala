package graft.functions

import graft.html.LicenseFinder

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.util.control.NonFatal

/** Catalyst expressions for the license-annotation stage (SURVEY §2.3 P1).
  *
  * `ExtractCcLicenses(html)` is the flagship operator: HTML → sorted array of
  * license structs + parse-error flag, the whole-operator equivalent of the
  * reference's `LicenseAnnotator`
  * (`/root/reference/src/c5/components/annotators/license_annotator.py:16-91`).
  * Runs as a scalar expression inside whole-stage codegen'd plans
  * (CodegenFallback for the eval itself — the surrounding projection still
  * fuses), so the cheap `contains(lower(html),'creativecommons.org')` gate can
  * sit in the same stage with no exchange in between.
  */
object ExtractCcLicenses {

  /** Field order mirrors the reference `License` dataclass (:112-121). */
  val licenseStruct: StructType = StructType(Seq(
    StructField("abbr", StringType, nullable = true),
    StructField("version", StringType, nullable = true),
    StructField("location", StringType, nullable = false),
    StructField("in_head", BooleanType, nullable = false),
    StructField("in_footer", BooleanType, nullable = false),
    StructField("element", StringType, nullable = false),
    StructField("left_context", StringType, nullable = false),
    StructField("right_context", StringType, nullable = false)))

  val outputType: StructType = StructType(Seq(
    StructField("licenses", ArrayType(licenseStruct, containsNull = false), nullable = true),
    StructField("parse_error", BooleanType, nullable = false)))
}

/** Static call targets for generated code (see [[ExprKernels]]): each hot
  * HTML/license kernel is a direct static call inside whole-stage codegen —
  * no CodegenFallback row-boxing detour on the fetch/annotate hot path. */
object CcKernels {

  private val GateNeedle: Array[Byte] =
    LicenseFinder.CcGateNeedle.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Byte-level cheap gate (`license_annotator.py:184-187`) evaluated on
    * the raw UTF8String BEFORE the UTF8→java.lang.String copy: ~96% of
    * pages carry no CC marker and skip both the copy and the tokenizer.
    * ASCII-only case folding — the needle is pure ASCII and no ASCII byte
    * occurs inside a UTF-8 multibyte sequence, so this matches Python's
    * `'creativecommons.org' in html.lower()` on the gate's domain. */
  def containsCcGate(s: UTF8String): Boolean = {
    val m = GateNeedle.length
    val max = s.numBytes - m
    var i = 0
    while (i <= max) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        var b = s.getByte(i + j)
        if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
        if (b != GateNeedle(j)) ok = false
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  def extractCcLicenses(html: UTF8String, contextNumChars: Int): InternalRow = {
    if (!containsCcGate(html)) // no CC marker: empty licenses, no parse error
      return InternalRow(new GenericArrayData(Array.empty[Any]), false)
    try {
      val licenses = LicenseFinder.findCcLicensesInHtml(html.toString,
        contextNumChars, preGated = true)
      val rows = licenses.map { l =>
        InternalRow(
          UTF8String.fromString(l.abbr),
          l.version.map(UTF8String.fromString).orNull,
          UTF8String.fromString(l.location),
          l.inHead,
          l.inFooter,
          UTF8String.fromString(l.element),
          UTF8String.fromString(l.leftContext),
          UTF8String.fromString(l.rightContext))
      }
      InternalRow(new GenericArrayData(rows.toArray[Any]), false)
    } catch {
      // license_parse_error=true path (`license_annotator.py:49-50`)
      case NonFatal(_) => InternalRow(null, true)
    }
  }

  def parseCcLicenseUrl(url: UTF8String): InternalRow = {
    val (abbr, version) = LicenseFinder.parseCcLicenseUrl(url.toString)
    InternalRow(
      abbr.map(UTF8String.fromString).orNull,
      version.map(UTF8String.fromString).orNull)
  }

  def extractLinks(html: UTF8String): ArrayData = {
    val root = graft.html.HtmlParser.parse(html.toString)
    val links = graft.html.Dom.elementsInOrder(root).iterator
      .filter(_.name == "a")
      .flatMap(_.attr("href"))
      .filter(h => h.startsWith("http://") || h.startsWith("https://"))
      .map(UTF8String.fromString)
      .toArray[Any]
    new GenericArrayData(links)
  }

  def normalizeNfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  // NOTE: kernels for case classes must live HERE, not on the case class's
  // companion — a companion method sharing a name with an inherited member
  // (e.g. Expression.eval) gets NO static forwarder, and generated Java
  // then fails to compile, silently de-optimizing the whole stage.
  def extractVisibleText(html: UTF8String): UTF8String = {
    val root = graft.html.HtmlParser.parse(html.toString)
    val sb = new StringBuilder
    def walk(e: graft.html.HElem): Unit = e.children.foreach {
      case t: graft.html.HText if !t.isComment => sb.append(t.text)
      case el: graft.html.HElem if !ExtractVisibleText.skipTags.contains(el.name) =>
        val block = ExtractVisibleText.blockTags.contains(el.name)
        if (block) sb.append('\n')
        walk(el)
        if (block) sb.append('\n')
      case _ => ()
    }
    walk(root)
    val lines = sb.toString.split('\n').iterator
      .map(_.split("(?U)\\s+").filter(_.nonEmpty).mkString(" "))
      .filter(_.nonEmpty)
    UTF8String.fromString(lines.mkString("\n"))
  }
}

case class ExtractCcLicenses(child: Expression, contextNumChars: Int = 150)
    extends UnaryExpression {

  override def dataType: DataType = ExtractCcLicenses.outputType
  override def prettyName: String = "extract_cc_licenses"

  override def nullSafeEval(input: Any): Any =
    CcKernels.extractCcLicenses(input.asInstanceOf[UTF8String], contextNumChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CcKernels.extractCcLicenses($c, $contextNumChars)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `parse_cc_license_url` as a scalar expression → struct(abbr, version). */
case class ParseCcLicenseUrl(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("abbr", StringType, nullable = true),
    StructField("version", StringType, nullable = true)))
  override def prettyName: String = "parse_cc_license_url"

  override def nullSafeEval(input: Any): Any =
    CcKernels.parseCcLicenseUrl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CcKernels.parseCcLicenseUrl($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Extract outgoing `<a href>` links (absolute http/https only) in document
  * order — feeds the next epoch's frontier. */
case class ExtractLinks(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "extract_links"
  override def nullSafeEval(input: Any): Any =
    CcKernels.extractLinks(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CcKernels.extractLinks($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (the composing half of the FTFY analog, P4). */
case class NormalizeNfc(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"
  override def nullSafeEval(input: Any): Any =
    CcKernels.normalizeNfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CcKernels.normalizeNfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Visible-text extraction from HTML (the Trafilatura-stage analog, P3):
  * skips script/style/head/title/meta/link/noscript/template subtrees and
  * comments, emits whitespace-normalized text with newlines at block-element
  * boundaries. */
object ExtractVisibleText {
  private[functions] val blockTags = Set("p", "div", "h1", "h2", "h3", "h4",
    "h5", "h6", "li", "tr", "br", "figcaption", "section", "article", "header",
    "footer", "blockquote", "pre", "nav", "table", "ul", "ol", "figure")
  private[functions] val skipTags = Set("script", "style", "head", "title",
    "meta", "link", "noscript", "template")
}

case class ExtractVisibleText(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "extract_visible_text"
  override def nullSafeEval(input: Any): Any =
    CcKernels.extractVisibleText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CcKernels.extractVisibleText($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Percent-decode (Python `urllib.parse.unquote` semantics — no '+' → space). */
case class UrlDecode(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_decode_py"
  override def nullSafeEval(input: Any): Any =
    ExprKernels.urlDecode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.urlDecode($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
