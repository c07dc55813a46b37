package graft.html

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Minimal mutable DOM for the license-extraction engine.
  *
  * Normalization contract (mirrors the reference's bs4/lxml behavior asserted
  * in `/root/reference/tests/test_bs4_casing.py`): tag names and attribute
  * NAMES are lowercased at parse time; attribute VALUES are case-preserved and
  * entity-decoded.
  */
sealed trait HNode {
  var parent: HElem = _
}

/** Text node; `isComment` marks `<!-- -->` content (kept for the traversal
  * rules of `license_annotator.py:369`, dropped at serialization). */
final class HText(val text: String, val isComment: Boolean = false) extends HNode

final class HElem(val name: String) extends HNode {
  val attrs: ArrayBuffer[(String, String)] = ArrayBuffer.empty
  val children: ArrayBuffer[HNode] = ArrayBuffer.empty

  def attr(n: String): Option[String] = attrs.find(_._1 == n).map(_._2)

  /** Multi-valued class attribute, split on whitespace (bs4 semantics). */
  def classes: Seq[String] =
    attr("class").map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Nil)

  def appendChild(n: HNode): Unit = { n.parent = this; children += n }
}

/** Raised when the input resembles a bare URL/filename rather than markup —
  * the analog of bs4's MarkupResemblesLocatorWarning escalated to an error in
  * `license_annotator.py:195`. */
final class HtmlParseException(msg: String) extends RuntimeException(msg)

/** Lenient streaming HTML parser: never throws on malformed markup, handles
  * void elements, raw-text elements (script/style), comments, doctypes, and
  * unclosed tags. Scoped to the constructs the reference's fixtures and the
  * synthetic corpus exercise (SURVEY.md §7.4 item 1). */
object HtmlParser {

  val VoidElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  private val RawText = Set("script", "style")

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "rsquo" -> "’", "lsquo" -> "‘",
    "rdquo" -> "”", "ldquo" -> "“", "laquo" -> "«",
    "raquo" -> "»", "deg" -> "°", "middot" -> "·",
    "bull" -> "•", "sect" -> "§", "para" -> "¶",
    "plusmn" -> "±", "times" -> "×", "divide" -> "÷",
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "ccedil" -> "ç", "ouml" -> "ö", "uuml" -> "ü",
    "auml" -> "ä", "szlig" -> "ß", "ntilde" -> "ñ")

  /** Decode HTML character references ("&amp;", "&#169;", "&#x2122;"). Unknown
    * or malformed references are left verbatim (browser-lenient). */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 32) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try Some(new String(Character.toChars(Integer.parseInt(body.drop(2), 16))))
              catch { case _: Exception => None }
            } else if (body.startsWith("#")) {
              try Some(new String(Character.toChars(Integer.parseInt(body.drop(1)))))
              catch { case _: Exception => None }
            } else NamedEntities.get(body)
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'

  /** Parse an HTML document/fragment into a synthetic "[document]" root. */
  def parse(html: String): HElem = {
    val root = new HElem("[document]")
    var stack: List[HElem] = root :: Nil
    def top: HElem = stack.head
    val n = html.length
    var i = 0
    var textStart = 0

    def flushText(until: Int): Unit =
      if (until > textStart) {
        val raw = html.substring(textStart, until)
        top.appendChild(new HText(decodeEntities(raw)))
      }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { flushText(n); i = n; textStart = n }
      else {
        flushText(lt)
        if (lt + 1 >= n) { // dangling '<' at EOF → literal text
          top.appendChild(new HText("<")); i = n; textStart = n
        } else {
          val c1 = html.charAt(lt + 1)
          if (html.startsWith("<!--", lt)) {
            val end = html.indexOf("-->", lt + 4)
            val (body, next) =
              if (end < 0) (html.substring(lt + 4), n) else (html.substring(lt + 4, end), end + 3)
            top.appendChild(new HText(body, isComment = true))
            i = next; textStart = next
          } else if (c1 == '!' || c1 == '?') { // doctype / processing instruction
            val end = html.indexOf('>', lt + 1)
            val next = if (end < 0) n else end + 1
            i = next; textStart = next
          } else if (c1 == '/') {
            var j = lt + 2
            val ns = j
            while (j < n && isNameChar(html.charAt(j))) j += 1
            val name = html.substring(ns, j).toLowerCase
            val end = html.indexOf('>', j)
            val next = if (end < 0) n else end + 1
            // pop to the matching open element if present (lenient recovery)
            if (name.nonEmpty && stack.exists(e => e.name == name && (e ne root)))
              stack = stack.dropWhile(_.name != name).drop(1) match {
                case Nil => root :: Nil
                case s => s
              }
            i = next; textStart = next
          } else if (isNameStart(c1)) {
            var j = lt + 1
            while (j < n && isNameChar(html.charAt(j))) j += 1
            val name = html.substring(lt + 1, j).toLowerCase
            val elem = new HElem(name)
            // attributes
            var selfClosed = false
            var done = false
            while (!done && j < n) {
              while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
              if (j < n && html.charAt(j) == '>') { j += 1; done = true }
              else if (j < n && html.charAt(j) == '/' && j + 1 < n && html.charAt(j + 1) == '>') {
                selfClosed = true; j += 2; done = true
              } else if (j >= n) { done = true }
              else {
                // attribute name
                val as = j
                while (j < n && !Character.isWhitespace(html.charAt(j)) &&
                  html.charAt(j) != '=' && html.charAt(j) != '>' &&
                  !(html.charAt(j) == '/' && j + 1 < n && html.charAt(j + 1) == '>')) j += 1
                val aname = html.substring(as, j).toLowerCase
                while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
                var avalue = ""
                if (j < n && html.charAt(j) == '=') {
                  j += 1
                  while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
                  if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                    val q = html.charAt(j); j += 1
                    val vs = j
                    while (j < n && html.charAt(j) != q) j += 1
                    avalue = html.substring(vs, j)
                    if (j < n) j += 1
                  } else {
                    val vs = j
                    while (j < n && !Character.isWhitespace(html.charAt(j)) && html.charAt(j) != '>') j += 1
                    avalue = html.substring(vs, j)
                  }
                }
                // first occurrence wins (bs4/lxml duplicate-attr behavior)
                if (aname.nonEmpty && !elem.attrs.exists(_._1 == aname))
                  elem.attrs += ((aname, decodeEntities(avalue)))
              }
            }
            top.appendChild(elem)
            val isVoid = VoidElements.contains(name)
            if (!isVoid && !selfClosed) {
              if (RawText.contains(name)) {
                // raw text until the matching close tag (case-insensitive)
                val closeIdx = indexOfIgnoreCase(html, "</" + name, j)
                val (body, next0) =
                  if (closeIdx < 0) (html.substring(j), n)
                  else (html.substring(j, closeIdx), closeIdx)
                if (body.nonEmpty) elem.appendChild(new HText(body))
                var next = next0
                if (closeIdx >= 0) {
                  val gtn = html.indexOf('>', closeIdx)
                  next = if (gtn < 0) n else gtn + 1
                }
                i = next; textStart = next
              } else {
                stack = elem :: stack
                i = j; textStart = j
              }
            } else { i = j; textStart = j }
            if (isVoid || selfClosed || RawText.contains(name)) () // already advanced
          } else {
            // '<' not starting a tag: literal text
            top.appendChild(new HText("<"))
            i = lt + 1; textStart = lt + 1
          }
        }
      }
    }
    root
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val lower = needle.toLowerCase
    var i = from
    val max = hay.length - needle.length
    while (i <= max) {
      if (hay.regionMatches(true, i, lower, 0, lower.length)) return i
      i += 1
    }
    -1
  }
}

/** Document-order traversal + the reference's `compress_html` serializer
  * (`license_annotator.py:304-320`): comments dropped, runs of ≥2 whitespace
  * chars collapsed to one space, script/style text trimmed, inter-tag
  * whitespace removed, attributes alphabetized, void elements self-closed. */
object Dom {

  private val MultiWs = Pattern.compile("\\s{2,}", Pattern.UNICODE_CHARACTER_CLASS)
  private val WsBetweenTags = Pattern.compile(">\\s+<", Pattern.UNICODE_CHARACTER_CLASS)

  /** Pre-order flatten (excluding the node itself for elements' positions —
    * descendants follow their element, matching bs4 next_elements). */
  def flatten(root: HElem): Vector[HNode] = {
    val out = Vector.newBuilder[HNode]
    def walk(e: HElem): Unit = e.children.foreach {
      case el: HElem => out += el; walk(el)
      case t: HText => out += t
    }
    walk(root)
    out.result()
  }

  def elementsInOrder(root: HElem): Vector[HElem] =
    flatten(root).collect { case e: HElem => e }

  def isAncestor(anc: HElem, n: HNode): Boolean = {
    var cur = n.parent
    while (cur != null) {
      if (cur eq anc) return true
      cur = cur.parent
    }
    false
  }

  private def escText(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def escAttr(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Serialize one element subtree with the reference's compression rules. */
  def compress(e: HElem): String = {
    val sb = new StringBuilder
    def ser(n: HNode, parentName: String): Unit = n match {
      case t: HText if t.isComment => ()
      case t: HText =>
        var cleaned = MultiWs.matcher(t.text).replaceAll(" ")
        if (parentName == "script" || parentName == "style") {
          sb.append(cleaned.trim) // raw-text content is never entity-escaped
        } else sb.append(escText(cleaned))
      case el: HElem =>
        sb.append('<').append(el.name)
        el.attrs.sortBy(_._1).foreach { case (k, v) =>
          sb.append(' ').append(k).append("=\"").append(escAttr(v)).append('"')
        }
        if (el.children.isEmpty && HtmlParser.VoidElements.contains(el.name))
          sb.append("/>")
        else {
          sb.append('>')
          el.children.foreach(ser(_, el.name))
          sb.append("</").append(el.name).append('>')
        }
    }
    ser(e, if (e.parent == null) "[document]" else e.parent.name)
    WsBetweenTags.matcher(sb.toString).replaceAll("><")
  }
}
