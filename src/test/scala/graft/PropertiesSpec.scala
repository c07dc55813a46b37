package graft

import graft.frontier.CuckooFilter
import graft.functions.{TextHashing, UrlNormalize}
import graft.html.LicenseFinder

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties from FIXTURES.md §5 / SURVEY §5 (t2). */
class PropertiesSpec extends AnyFunSuite {

  /** Run a property through ScalaCheck's engine (scalatestplus isn't in the
    * offline cache, so bridge by hand). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http://", "https://", "HTTP://", "")
    host <- Gen.oneOf("Example.COM", "sub.domain.co.uk", "site9.example", "a.b.c.org")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/a/b", "/p%61th", "/x%2Fy", "/UPPER")
    q <- Gen.oneOf("", "?a=1&b=2", "?q=%20x")
    frag <- Gen.oneOf("", "#frag", "#a/b")
  } yield s"$scheme$host$port$path$q$frag"

  test("canonicalize is idempotent") {
    check(Prop.forAll(urlGen) { u =>
      val c = UrlNormalize.canonicalize(u)
      UrlNormalize.canonicalize(c) == c
    })
  }

  test("canonical urls always carry scheme and non-empty path") {
    check(Prop.forAll(urlGen) { u =>
      val c = UrlNormalize.canonicalize(u)
      c.contains("://") && c.indexOf('/', c.indexOf("://") + 3) > 0 && !c.contains("#")
    })
  }

  test("url hash is a pure function of the canonical form") {
    check(Prop.forAll(urlGen) { u =>
      val c = UrlNormalize.canonicalize(u)
      UrlNormalize.urlHash64(c) == UrlNormalize.urlHash64(UrlNormalize.canonicalize(c))
    })
  }

  test("percentDecode never throws and preserves non-escape text") {
    val weird = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('%', '2', 'F', ' ', 'é')))
      .map(_.mkString)
    check(Prop.forAll(weird) { s =>
      val d = LicenseFinder.percentDecode(s)
      d != null && (!s.contains("%") || d.length <= s.length)
    })
  }

  test("cuckoo filter: inserted keys are always found (no false negatives)") {
    check(Prop.forAll(Gen.listOfN(500, Gen.long)) { keys =>
      val f = CuckooFilter.forCapacity(2000)
      val inserted = keys.filter(f.insert)
      inserted.forall(f.contains)
    })
  }

  test("minhash signature length and whitespace invariance") {
    val textGen = Gen.listOf(Gen.oneOf("ab", "cd", "ef", "gh", "ij")).map(_.mkString(" "))
    check(Prop.forAll(textGen) { t =>
      val a = TextHashing.minhashSig(t, 32, 3)
      val b = TextHashing.minhashSig(t.replace(" ", "   "), 32, 3)
      a.length == 32 && a.toSeq == b.toSeq
    })
  }

  test("license finder is lenient: arbitrary markup never throws (R3)") {
    val junkGen = for {
      pieces <- Gen.listOf(Gen.oneOf(
        Gen.alphaNumStr,
        Gen.oneOf("<", ">", "</", "<!--", "-->", "\"", "'", "=", "<a href=",
          "creativecommons.org", "<meta name=license", "<script type=\"application/ld+json\">",
          "{\"license\":", "</script>", "<div class=", "&amp;", "%2F", "<<<>>>")))
    } yield pieces.mkString(" ")
    check(Prop.forAll(junkGen) { s =>
      // the only designed throw is the bare-locator path, which requires a
      // whitespace-free input; these always contain spaces between pieces
      val input = "x " + s
      LicenseFinder.findCcLicensesInHtml(input) != null
    })
  }

  test("sortLicenses is stable and a permutation") {
    import graft.html.CcLicense
    val licGen = for {
      loc <- Gen.oneOf("meta_tag", "json-ld", "link_tag", "a_tag")
      h <- Gen.oneOf(true, false)
      f <- Gen.oneOf(true, false)
      tag <- Gen.identifier
    } yield CcLicense("by", Some("4.0"), loc, h, f, tag)
    check(Prop.forAll(Gen.listOf(licGen)) { ls =>
      val sorted = LicenseFinder.sortLicenses(ls)
      val keyOf = (l: CcLicense) =>
        (LicenseFinder.LocationPreferenceOrder.indexOf(l.location),
          if (l.inHead) 0 else 1, if (l.inFooter) 0 else 1)
      val ordered = sorted.sliding(2).forall {
        case Seq(a, b) => {
          val (ka, kb) = (keyOf(a), keyOf(b))
          implicitly[Ordering[(Int, Int, Int)]].lteq(ka, kb)
        }
        case _ => true
      }
      // stability: equal keys keep input order (element strings as witness)
      val stable = ls.groupBy(keyOf).forall { case (k, grp) =>
        sorted.filter(l => keyOf(l) == k).map(_.element) == grp.map(_.element)
      }
      ordered && stable &&
        sorted.map(_.toString).sorted == ls.map(_.toString).sorted // permutation
    })
  }
}
