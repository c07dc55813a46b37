package graft.pipeline

import graft.core.C5Schema
import graft.functions.GraftFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's 11-step main pipeline re-expressed as one declarative
  * DataFrame chain (`build_main_pipeline`, `script_utils.py:126-231`):
  *
  *   reader → URLFilter → CCTextFilter → LicenseAnnotator → LicenseFilter →
  *   text extraction → LanguageFilter → FTFY → PII → SymbolLines → writer
  *
  * All eleven stages are narrow transformations — Catalyst fuses them into a
  * single whole-stage-codegen'd pass over the scan, the columnar analog of
  * the reference's generator chain (SURVEY §3.1). The only wide operations a
  * crawl epoch adds are the deliberate ones (seen-set join, politeness
  * window, partitioned write).
  */
object MainPipeline {

  /** F5 `LanguageFilterWithIgnore` analog (`language_filter_with_ignore.py`):
    * per-language score, argmax in fixed order, keep iff score strictly
    * exceeds the language's threshold (defaultdict semantics: missing →
    * default), annotate language/script/score. The glotlid model has no JVM
    * twin; the scorer is the deterministic stopword-ratio heuristic with the
    * same argmax/threshold/ignore semantics (SURVEY §7.5). */
  final case class LangConfig(
      thresholds: Map[String, Double] = Map("en" -> 0.10),
      defaultThreshold: Double = 0.05)

  private def langStops: Seq[(String, Seq[String])] =
    graft.functions.LangHeuristic.langStops

  /** Language pick + raw score via the single-pass `lang_decision` kernel
    * ([[graft.functions.LangHeuristic.decide]]): one whitespace
    * tokenization, per-language stopword hit counts, then the argmax/
    * strict-threshold/fixed-order-tie rule — token and score semantics
    * identical to the declarative `aggregate` tree it replaces (round 2's
    * shape), which allocated a struct accumulator per TOKEN and generated
    * the largest whole-stage-codegen blob of the 11-stage pipeline. The two
    * returned columns share the identical kernel subtree, which codegen's
    * subexpression elimination computes once. */
  def languageColumns(text: Column, cfg: LangConfig = LangConfig()): Seq[Column] = {
    val ths = langStops.map(p =>
      lit(cfg.thresholds.getOrElse(p._1, cfg.defaultThreshold)))
    val decision = call_function("lang_decision", text +: ths: _*)
    Seq(decision.getField("language").as("language"),
      decision.getField("score").as("language_score_raw"))
  }

  /** Run the annotation pipeline over a fetched-documents frame with columns
    * (id, dump, url, date, file_path, html) → the exact C5 output schema.
    *
    * @param bannedDomains F1 `URLFilter` extra_domains (broadcast anti-set)
    */
  def annotate(fetched: DataFrame,
      bannedDomains: Set[String] = Set.empty,
      cfg: LangConfig = LangConfig()): DataFrame = {
    val spark = fetched.sparkSession
    GraftFunctions.register(spark)

    // Per-reason drop counters on EVERY filter stage (datatrove A7 parity,
    // `base.py:41-42`): each stage observes its drop count in the same pass
    // that filters — metrics ride the action, no extra jobs. Readable from
    // queryExecution.observedMetrics or a QueryExecutionListener.

    // F1: URL filter on registered domain (broadcast set, SURVEY §2.4)
    val banned = typedLit(bannedDomains.toSeq)
    val urlFiltered =
      if (bannedDomains.isEmpty) fetched
      else fetched
        .withColumn("__banned",
          array_contains(banned, GraftFunctions.registeredDomain(col("url"))))
        .observe("url_filter",
          count(when(col("__banned"), 1)).as("dropped_banned_domain"))
        .filter(!col("__banned"))
        .drop("__banned")

    // F2: cheap gate BEFORE the expensive parse (R1 — kept explicit)
    val gated = urlFiltered
      .withColumn("__cc_gate",
        contains(lower(col("html")), lit("creativecommons.org")))
      .observe("cc_gate",
        count(when(!col("__cc_gate"), 1)).as("dropped_no_cc_substring"))
      .filter(col("__cc_gate"))
      .drop("__cc_gate")

    // P1: license annotation
    val lic = gated.withColumn("__lic",
      GraftFunctions.extractCcLicenses(col("html")))

    // F4: LicenseFilter — drop parse errors and no-license rows, with
    // per-reason drop metrics (A7) via observe
    val annotated = lic.select(col("*") +: GraftFunctions.licenseMetadataColumns(col("__lic")): _*)
      .observe("license_filter",
        count(when(col("license_parse_error"), 1)).as("dropped_parse_error"),
        count(when(!col("license_parse_error") && col("license_abbr").isNull, 1))
          .as("dropped_no_explicit_license"))
      .filter(!col("license_parse_error") && col("license_abbr").isNotNull)

    // P3: text extraction (visible text; Trafilatura-stage analog)
    val withText = annotated.withColumn("text",
      GraftFunctions.extractVisibleText(col("html")))

    // F5: language filter + annotation
    val langCols = languageColumns(col("text"), cfg)
    val withLang = withText
      .withColumn("language", langCols.head)
      .withColumn("language_score",
        round(coalesce(langCols(1), lit(0.0)), 6))
      .observe("language_filter",
        count(when(col("language").isNull, 1))
          .as("dropped_no_language_above_its_threshold"))
      .filter(col("language").isNotNull)
      // all five heuristic languages are Latin-script; the reference's
      // `{language}_{language_script}` convention is preserved
      .withColumn("language_script", lit("Latn"))

    // P4-P6: formatters
    val formatted = withLang.withColumn("text",
      Formatters.stripSymbolLines(Formatters.scrubPii(Formatters.fixText(col("text")))))

    // Exact C5 column set + order (script_utils.py:285-323)
    formatted.select(
      col("text"), col("id"), col("dump"), col("url"), col("date"), col("file_path"),
      col("license_abbr"), col("license_version"), col("license_location"),
      col("license_in_head"), col("license_in_footer"), col("license_element"),
      col("license_left_context"), col("license_right_context"),
      col("potential_licenses"),
      col("license_parse_error"), col("license_disagreement"),
      col("language_script"), col("language"), col("language_score"),
      lit(null).cast("boolean").as("found_in_fw"))
  }

  /** F3 EmptyTextFilter analog: drop rows whose text is empty or
    * whitespace-only (the reference defines but never wires it into the main
    * pipeline; exposed for parity as a standalone narrow filter). */
  def emptyTextFilter(df: DataFrame, textCol: String = "text"): DataFrame =
    df.filter(trim(col(textCol)) =!= "")

  /** U3 set-equality analog — DISTRIBUTED: two except-emptiness probes
    * instead of collecting both sides to the driver (the reference compares
    * collected python sets; that shape caps out at driver memory). */
  def setEquals(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  /** J1: FineWeb containment backfill — broadcast-or-shuffled left join with
    * IS NOT NULL flag; `overwriteWithNone` reproduces the recency gate's
    * constant-fold (R6: skip all join work for ignored crawls). */
  def withContainment(c5: DataFrame, seenKeys: DataFrame,
      overwriteWithNone: Boolean): DataFrame =
    if (overwriteWithNone)
      c5.withColumn("found_in_fw", lit(null).cast("boolean"))
    else {
      val keys = seenKeys.select(col("dump").as("__d"), col("id").as("__i")).distinct()
      c5.drop("found_in_fw")
        .join(keys, col("dump") === col("__d") && col("id") === col("__i"), "left")
        .withColumn("found_in_fw", col("__i").isNotNull)
        .drop("__d", "__i")
    }

  /** K1/K3 sink: language-partitioned write (`${language}_${language_script}`
    * directories, `script_utils.py:227-230`) as native partitioned parquet. */
  def write(c5: DataFrame, outDir: String, format: String = "parquet"): Unit = {
    val withPart = c5.withColumn("lang_dir",
      concat(col("language"), lit("_"), col("language_script")))
    val w = withPart.write.mode("overwrite").partitionBy("lang_dir")
    format match {
      case "parquet" => w.option("compression", "zstd").parquet(outDir)
      case "json" => w.option("compression", "gzip").json(outDir)
    }
  }
}
