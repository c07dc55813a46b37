package graft.html

import java.util.regex.Pattern

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** One found Creative-Commons license (reference `License` dataclass,
  * `/root/reference/src/c5/components/annotators/license_annotator.py:112-121`). */
final case class CcLicense(
    abbr: String,
    version: Option[String],
    location: String,
    inHead: Boolean,
    inFooter: Boolean,
    element: String,
    leftContext: String = "",
    rightContext: String = "")

/** Pure-Scala re-implementation of the reference's license extraction
  * (`license_annotator.py:127-484`), semantics-exact against the golden
  * fixtures in `/root/reference/tests/test_license_annotator.py`.
  */
object LicenseFinder {

  val CcAbbrs: Set[String] =
    Set("by", "by-sa", "by-nd", "by-nc", "by-nc-sa", "by-nc-nd", "zero", "certification", "mark")

  /** Preference order, best first (`license_annotator.py:101`). */
  val LocationPreferenceOrder: Vector[String] =
    Vector("meta_tag", "json-ld", "link_tag", "a_tag")

  // creativecommons\.org/(?:licenses|publicdomain)/([^/]+)/(\d\.\d)  (:106)
  private val CcUrlRegex =
    Pattern.compile("creativecommons\\.org/(?:licenses|publicdomain)/([^/]+)/(\\d\\.\\d)")
  // ^[^a-z]+|[^a-z]+$  (:107)
  private val CodeCleanupRegex = Pattern.compile("^[^a-z]+|[^a-z]+$")

  private val NonVisibleTags =
    Set("script", "style", "head", "title", "meta", "link", "noscript", "template")

  private val WsSplit = Pattern.compile("\\s+", Pattern.UNICODE_CHARACTER_CLASS)

  /** The cheap-gate needle, shared with the byte-level pre-gate in
    * `CcKernels.containsCcGate` so the two cannot drift. */
  val CcGateNeedle = "creativecommons.org"

  /** ASCII-only case folding, deliberately: the needle is pure ASCII, and
    * Python's `needle in html.lower()` (`license_annotator.py:184-187`) does
    * NOT match exotic spellings either (str.lower maps U+0130 'İ' to
    * "i"+combining-dot, which breaks the substring). Java's
    * `regionMatches(true,…)` Unicode folding (İ→i, K→k) would accept pages
    * the reference rejects — and would disagree with the byte-level pre-gate
    * `CcKernels.containsCcGate`, which folds A-Z only. The two gates must
    * agree exactly: a page passing one but not the other would silently skip
    * extraction. */
  private def containsIgnoreCaseFast(hay: String, needleLower: String): Boolean = {
    val m = needleLower.length
    val max = hay.length - m
    var i = 0
    while (i <= max) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        var c = hay.charAt(i + j)
        if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
        if (c != needleLower.charAt(j)) ok = false
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  /** Percent-decode like Python `urllib.parse.unquote`: decodes %XX byte
    * sequences as UTF-8, leaves '+' and malformed escapes untouched. */
  def percentDecode(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val out = new StringBuilder(s.length)
    val bytes = new java.io.ByteArrayOutputStream()
    def flushBytes(): Unit =
      if (bytes.size() > 0) {
        out.append(new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
        bytes.reset()
      }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        flushBytes()
        out.append(c)
        i += 1
      }
    }
    flushBytes()
    out.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** `parse_cc_license_url` (`license_annotator.py:127-160`): URL →
    * (abbr, version). (None, None) if not a creativecommons.org URL;
    * ("cc-unknown", None) when the host matches but the pattern/code doesn't.
    */
  def parseCcLicenseUrl(licenseUrl: String): (Option[String], Option[String]) = {
    val url = percentDecode(licenseUrl).toLowerCase
    if (!url.contains("creativecommons.org")) return (None, None)
    val m = CcUrlRegex.matcher(url)
    if (!m.find()) return (Some("cc-unknown"), None)
    val code = CodeCleanupRegex.matcher(m.group(1)).replaceAll("")
    val version = m.group(2)
    if (CcAbbrs.contains(code)) (Some(code), Some(version))
    else (Some("cc-unknown"), None)
  }

  /** `has_head_or_footer_ancestor` (`license_annotator.py:457-484`): bottom-up
    * walk, `head` wins first; footer = tag named footer OR "footer" substring
    * in id or any class token (value comparison case-SENSITIVE, as in the
    * reference). */
  def headFooterAncestor(tag: HElem): (Boolean, Boolean) = {
    var cur: HElem = tag
    while (cur != null) {
      if (cur.name == "head") return (true, false)
      if (cur.name == "footer" ||
        cur.attr("id").exists(_.contains("footer")) ||
        cur.classes.exists(_.contains("footer"))) return (false, true)
      cur = cur.parent
    }
    (false, false)
  }

  /** `sort_licenses` (`license_annotator.py:434-454`): stable sort by
    * (location preference, in_head true-first, in_footer true-first). */
  def sortLicenses(results: Seq[CcLicense]): Seq[CcLicense] =
    results.sortBy(l =>
      (LocationPreferenceOrder.indexOf(l.location),
        if (l.inHead) 0 else 1,
        if (l.inFooter) 0 else 1))

  /** ` ".join(s.split())` — unicode-whitespace normalize + trim. */
  private def normalizeWs(s: String): String =
    WsSplit.split(s.trim).filter(_.nonEmpty).mkString(" ")

  /** `get_context_text_from_dom` (`license_annotator.py:326-393`).
    *
    * @param nodes    pre-order flatten of the document
    * @param tagIdx   index of the anchor tag within `nodes`
    * @param previous true → walk backwards (nearest first), false → forwards
    */
  private def contextText(
      nodes: Vector[HNode],
      tagIdx: Int,
      tag: HElem,
      previous: Boolean,
      contextLength: Int): String = {
    val candidates: Iterator[HText] =
      if (previous)
        (tagIdx - 1 to 0 by -1).iterator.map(nodes(_)).collect { case t: HText => t }
      else
        (tagIdx + 1 until nodes.length).iterator.map(nodes(_)).collect { case t: HText => t }

    var finalText = ""
    var collected = 0
    var done = false
    val it = candidates
    while (!done && it.hasNext) {
      val node = it.next()
      if (collected >= contextLength) {
        finalText =
          if (previous) finalText.takeRight(contextLength)
          else finalText.take(contextLength)
        done = true
      } else {
        val parentName = if (node.parent == null) "" else node.parent.name
        val skip =
          NonVisibleTags.contains(parentName) ||
            node.isComment ||
            (!previous && Dom.isAncestor(tag, node))
        if (!skip && node.text.nonEmpty) {
          finalText =
            if (previous) node.text + " " + finalText
            else finalText + " " + node.text
          finalText = normalizeWs(finalText)
          collected = finalText.length
        }
      }
    }
    finalText
  }

  private val jsonMapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.enable(DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    m
  }

  /** Python truthiness for JSON values (`if not license_val_candidate`). */
  private def isFalsy(n: JsonNode): Boolean =
    n == null || n.isNull ||
      (n.isTextual && n.asText().isEmpty) ||
      (n.isArray && n.size() == 0) ||
      (n.isObject && n.size() == 0) ||
      (n.isBoolean && !n.asBoolean()) ||
      (n.isNumber && n.asDouble() == 0.0)

  /** Lowercase object keys, last-wins on collision (dict comprehension
    * semantics of `license_annotator.py:272,287`). */
  private def lowerKeys(n: JsonNode): Map[String, JsonNode] = {
    var m = Map.empty[String, JsonNode]
    n.properties().asScala.foreach(e => m = m.updated(e.getKey.toLowerCase, e.getValue))
    m
  }

  /** bs4 `.string`: defined iff the tag has exactly one child which is a
    * plain text node (recursing through single-element children). */
  private def tagString(e: HElem): Option[String] =
    if (e.children.length != 1) None
    else e.children.head match {
      case t: HText if !t.isComment => Some(t.text)
      case el: HElem => tagString(el)
      case _ => None
    }

  /** `find_cc_licenses_in_html` (`license_annotator.py:173-295`).
    *
    * @throws HtmlParseException for inputs that resemble a bare URL/filename
    *         (the MarkupResemblesLocatorWarning→error path, `:191-195`)
    */
  def findCcLicensesInHtml(html: String, contextNumChars: Int = 150,
      preGated: Boolean = false): List[CcLicense] = {
    // Cheap gate before any parsing (`:184-187`) — also the explicit upstream
    // filter CCTextFilter (SURVEY §2.4 F2) so plans keep it ahead of this
    // call. Allocation-free case-insensitive scan: this runs on EVERY page
    // and a full toLowerCase would copy ~1 KB per document. Callers that
    // already ran the byte-level gate (`CcKernels.containsCcGate`, same
    // ASCII fold over the same needle) pass `preGated = true` and skip the
    // redundant re-scan (measured negligible on the synthetic corpus, where
    // licenses sit near the head — it matters when the first marker is deep
    // in a large page).
    if (!preGated && !containsIgnoreCaseFast(html, CcGateNeedle)) return Nil

    val trimmed = html.trim
    if (!trimmed.contains('<') &&
      !trimmed.exists(Character.isWhitespace)) {
      // Bare URL / filename-like input: bs4 raises MarkupResemblesLocatorWarning
      // which the reference escalates to an error (license_parse_error=true).
      throw new HtmlParseException("input resembles a locator, not markup")
    }

    val root = HtmlParser.parse(html)
    val nodes = Dom.flatten(root)
    val elems = nodes.collect { case e: HElem => e }

    // collected (tag, abbr, version, location, inHead, inFooter) in channel order
    final case class Hit(tag: HElem, abbr: String, version: Option[String],
        location: String, inHead: Boolean, inFooter: Boolean)
    val hits = ArrayBuffer.empty[Hit]

    def parseContentLicense(potentialUrl: String, place: String, tag: HElem): Unit = {
      val u = potentialUrl.trim
      if (u.nonEmpty) {
        val (abbr, version) = parseCcLicenseUrl(u)
        abbr.foreach { a =>
          val (inHead, inFooter) = headFooterAncestor(tag)
          hits += Hit(tag, a, version, place, inHead, inFooter)
        }
      }
    }

    def containsCi(hay: String, needle: String): Boolean =
      hay.toLowerCase.contains(needle)

    // Channel 1: meta[name="license" i][content*="creativecommons.org" i],
    //            meta[property="og:license" i][content*=... i]   (:229-232)
    elems.foreach { e =>
      if (e.name == "meta") {
        val nameMatch = e.attr("name").exists(_.equalsIgnoreCase("license"))
        val propMatch = e.attr("property").exists(_.equalsIgnoreCase("og:license"))
        if (nameMatch || propMatch)
          e.attr("content").filter(containsCi(_, "creativecommons.org"))
            .foreach(parseContentLicense(_, "meta_tag", e))
      }
    }

    // Channel 2: link[href*=...] and a[href*=...] in document order (:234-237)
    elems.foreach { e =>
      if (e.name == "link" || e.name == "a")
        e.attr("href").filter(containsCi(_, "creativecommons.org"))
          .foreach(parseContentLicense(_, s"${e.name}_tag", e))
    }

    // Channel 3: JSON-LD (:239-292)
    elems.foreach { e =>
      if (e.name == "script" &&
        e.attr("type").exists(_.equalsIgnoreCase("application/ld+json"))) {
        tagString(e).filter(_.nonEmpty).foreach { text =>
          val parsed: Option[JsonNode] =
            try Option(jsonMapper.readTree(text))
            catch { case _: Exception => None }
          parsed.foreach { data =>
            val dataList: Seq[JsonNode] =
              if (data.isObject) Seq(data)
              else if (data.isArray) data.elements().asScala.toSeq
              else Nil
            dataList.foreach { item =>
              if (item.isObject) {
                val lowered = lowerKeys(item)
                val cand = lowered.get("license").filterNot(isFalsy)
                cand.foreach { c =>
                  val vals: Seq[JsonNode] =
                    if (c.isArray) c.elements().asScala.toSeq else Seq(c)
                  vals.foreach { v =>
                    if (v.isObject) {
                      val lv = lowerKeys(v)
                      // dict.get("@id", dict.get("url")): fall back to "url"
                      // only when the "@id" KEY is absent (not merely falsy)
                      val urlNode = lv.get("@id").orElse(lv.get("url"))
                        .filterNot(isFalsy)
                      urlNode.filter(_.isTextual)
                        .foreach(u => parseContentLicense(u.asText(), "json-ld", e))
                    } else if (v.isTextual) {
                      parseContentLicense(v.asText(), "json-ld", e)
                    }
                  }
                }
              }
            }
          }
        }
      }
    }

    // Contexts only for a_tag hits not in head (:413-426), then element
    // compression (:428) and the stable preference sort (:294-295).
    val withContext = hits.toList.map { h =>
      val (left, right) =
        if (!h.inHead && h.location == "a_tag") {
          val idx = nodes.indexWhere(_ eq h.tag)
          (contextText(nodes, idx, h.tag, previous = true, contextNumChars),
            contextText(nodes, idx, h.tag, previous = false, contextNumChars))
        } else ("", "")
      CcLicense(h.abbr, h.version, h.location, h.inHead, h.inFooter,
        Dom.compress(h.tag), left, right)
    }
    sortLicenses(withContext).toList
  }
}
