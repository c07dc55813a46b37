package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level formatter stages (SURVEY §2.3 P4-P6 analogs). All are native
  * `regexp_replace`/normalize chains — codegen'd, no UDFs in the hot path.
  * Exact ftfy parity is out of scope (no JVM twin); the deviation is
  * documented in SURVEY §7.5 and covered by our own fixtures.
  */
object Formatters {

  /** P5 `PIIFormatter`: scrub emails and IPv4 addresses (datatrove-style
    * regex + replacement, `script_utils.py:225`). */
  def scrubPii(text: Column,
      emailToken: String = "<email>", ipToken: String = "<ip>"): Column = {
    val email = "[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)+"
    val ipv4 = "\\b(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(\\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}\\b"
    regexp_replace(regexp_replace(text, email, emailToken), ipv4, ipToken)
  }

  /** P6 `SymbolLinesFormatter`: lines consisting of `|` (table artifacts of
    * the text extractor) become empty (`script_utils.py:226`). */
  def stripSymbolLines(text: Column): Column =
    regexp_replace(text, "(?m)^[ \\t]*\\|[ \\t|]*$", "")

  /** P4 `FTFYFormatter` analog: NFC normalization + the classic UTF-8-as-
    * latin1 mojibake pairs. */
  def fixText(text: Column): Column = {
    val mojibake = Seq(
      "â€™" -> "’", "â€œ" -> "“", "â€" -> "”", "â€“" -> "–",
      "â€”" -> "—", "â€¦" -> "…", "Ã©" -> "é", "Ã¨" -> "è",
      "Ã¼" -> "ü", "Ã¶" -> "ö", "Ã¤" -> "ä", "Ã±" -> "ñ", "Ã§" -> "ç")
    val replaced = mojibake.foldLeft(text) { case (c, (bad, good)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(bad), good)
    }
    // NFC via a tiny deterministic expression-free path: Spark has no native
    // normalizer; most NFC work on web text is the mojibake table above, and
    // the remaining combining-mark composition is handled in NormalizeNfc.
    graft.functions.GraftFunctions.normalizeNfc(replaced)
  }
}
