package graft.functions

import graft.html.LicenseFinder

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
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

case class ExtractCcLicenses(child: Expression, contextNumChars: Int = 150)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ExtractCcLicenses.outputType
  override def prettyName: String = "extract_cc_licenses"

  override def nullSafeEval(input: Any): Any = {
    val html = input.asInstanceOf[UTF8String].toString
    try {
      val licenses = LicenseFinder.findCcLicensesInHtml(html, contextNumChars)
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `parse_cc_license_url` as a scalar expression → struct(abbr, version). */
case class ParseCcLicenseUrl(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("abbr", StringType, nullable = true),
    StructField("version", StringType, nullable = true)))
  override def prettyName: String = "parse_cc_license_url"

  override def nullSafeEval(input: Any): Any = {
    val (abbr, version) = LicenseFinder.parseCcLicenseUrl(input.toString)
    InternalRow(
      abbr.map(UTF8String.fromString).orNull,
      version.map(UTF8String.fromString).orNull)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Extract outgoing `<a href>` links (absolute http/https only) in document
  * order — feeds the next epoch's frontier. */
case class ExtractLinks(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "extract_links"
  override def nullSafeEval(input: Any): Any = {
    val root = graft.html.HtmlParser.parse(input.toString)
    val links = graft.html.Dom.elementsInOrder(root).iterator
      .filter(_.name == "a")
      .flatMap(_.attr("href"))
      .filter(h => h.startsWith("http://") || h.startsWith("https://"))
      .map(UTF8String.fromString)
      .toArray[Any]
    new GenericArrayData(links)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (the composing half of the FTFY analog, P4). */
case class NormalizeNfc(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.toString, java.text.Normalizer.Form.NFC))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Visible-text extraction from HTML (the Trafilatura-stage analog, P3):
  * skips script/style/head/title/meta/link/noscript/template subtrees and
  * comments, emits whitespace-normalized text with newlines at block-element
  * boundaries. */
case class ExtractVisibleText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "extract_visible_text"

  private val blockTags = Set("p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "tr", "br", "figcaption", "section", "article", "header", "footer",
    "blockquote", "pre", "nav", "table", "ul", "ol", "figure")
  private val skipTags = Set("script", "style", "head", "title", "meta",
    "link", "noscript", "template")

  override def nullSafeEval(input: Any): Any = {
    val root = graft.html.HtmlParser.parse(input.toString)
    val sb = new StringBuilder
    def walk(e: graft.html.HElem): Unit = e.children.foreach {
      case t: graft.html.HText if !t.isComment => sb.append(t.text)
      case el: graft.html.HElem if !skipTags.contains(el.name) =>
        val block = blockTags.contains(el.name)
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
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Percent-decode (Python `urllib.parse.unquote` semantics — no '+' → space). */
case class UrlDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_decode_py"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(LicenseFinder.percentDecode(input.toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
