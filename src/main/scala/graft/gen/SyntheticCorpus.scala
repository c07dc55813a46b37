package graft.gen

import graft.functions.GraftFunctions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic (seeded) synthetic corpus per FIXTURES.md §1-2 and the
  * north-rule `input_hint`: the Iceberg-shaped image+caption table, a
  * simulated web of pages (zipfian host skew, ~3.5% license-bearing per the
  * reference's measured CC hit rate, `benchmark_license_finder.py:118`),
  * seed URLs with canonicalization traps, and robots rules.
  *
  * Everything is generated distributed (`spark.range` + expressions) — no
  * driver-side loops — so corpus size scales with the cluster.
  */
object SyntheticCorpus {

  private val captionWords = Seq(
    "sunset", "bridge", "meadow", "harbor", "portrait", "skyline", "forest",
    "tejado", "montaña", "fluss", "château", "zonsondergang", "lumière",
    "winter", "strand", "mercado", "garten", "rivière")

  /** Caption: 6 deterministic words from the (multilingual-ish) list. */
  private def captionCol(id: org.apache.spark.sql.Column) = concat_ws(" ",
    (0 until 6).map(i =>
      element_at(array(captionWords.map(lit): _*),
        (pmod(hash(id.cast("string"), lit(i)), lit(captionWords.size)) + 1).cast("int"))): _*)

  /** The image+caption input table:
    * (image_id, bytes, w, h, fmt, caption, phash). */
  def images(spark: SparkSession, n: Long): DataFrame = {
    GraftFunctions.register(spark)
    val id = col("id")
    val w = (pmod(hash(id.cast("string"), lit("w")), lit(113)) + 16).cast("int")
    val h = (pmod(hash(id.cast("string"), lit("h")), lit(113)) + 16).cast("int")
    val fmt = element_at(array(lit("png"), lit("bmp"), lit("jpeg")),
      (pmod(id, lit(3)) + 1).cast("int"))
    spark.range(n)
      .select(
        format_string("img-%08d", id).as("image_id"),
        GraftFunctions.genImage(id, w, h, fmt).as("bytes"),
        w.as("w"), h.as("h"), fmt.as("fmt"),
        captionCol(id).as("caption"))
      .withColumn("phash", GraftFunctions.phash64(col("bytes")))
  }

  /** Zipfian-ish host index: quadratic concentration toward host 0. */
  private def hostIdx(id: org.apache.spark.sql.Column, nHosts: Int) = {
    val u = pmod(hash(id.cast("string"), lit("host")), lit(10000)).cast("double") / 10000.0
    floor(u * u * nHosts).cast("int")
  }

  def pageUrl(id: org.apache.spark.sql.Column, nHosts: Int) =
    concat(lit("http://site"), hostIdx(id, nHosts), lit(".example/page/"), id)

  /** Simulated fetch corpus: (url, html, image_id). Each page embeds its
    * image, a caption figure, 3 out-links, and — for ~3.5% of pages — a CC
    * license in one of the four channels. */
  def pages(spark: SparkSession, n: Long, nHosts: Int = 64): DataFrame = {
    GraftFunctions.register(spark)
    val id = col("id")
    val url = pageUrl(id, nHosts)
    val imageId = format_string("img-%08d", id)
    val licUrl = element_at(
      array(graft.Queries.ccUrls.take(10).map(lit): _*),
      (pmod(id, lit(10)) + 1).cast("int"))
    val channel = pmod(id, lit(4))
    val licenseBlock =
      when(pmod(id, lit(29)) =!= 0, lit("")) // ~3.45% of pages carry a license
        .otherwise(
          when(channel === 0, concat(lit("<meta name=\"license\" content=\""), licUrl, lit("\">")))
            .when(channel === 1, concat(lit("<link rel=\"license\" href=\""), licUrl, lit("\">")))
            .when(channel === 2, concat(lit("<a rel=\"license\" href=\""), licUrl, lit("\">License</a>")))
            .otherwise(concat(
              lit("<script type=\"application/ld+json\">{\"license\":\""), licUrl,
              lit("\"}</script>"))))
    val headBlock = when(channel <= 1, licenseBlock).otherwise(lit(""))
    val bodyLicense = when(channel >= 2, licenseBlock).otherwise(lit(""))
    def link(k: Int) = pageUrl(pmod(hash(id.cast("string"), lit(s"l$k")), lit(n)), nHosts)
    val html = concat(
      lit("<html><head><title>Page </title>"), headBlock,
      lit("</head><body><h1>Gallery</h1><figure><img src=\"/"), imageId,
      lit(".jpg\"><figcaption>"), captionCol(id),
      lit("</figcaption></figure><p>"), captionCol(hash(id, lit("p"))),
      lit("</p><div class=\"page-footer\">"), bodyLicense,
      lit("</div><nav><a href=\""), link(1), lit("\">n1</a> <a href=\""),
      link(2), lit("\">n2</a> <a href=\""), link(3),
      lit("\">n3</a></nav></body></html>"))
    spark.range(n).select(url.as("url"), html.as("html"), imageId.as("image_id"))
  }

  /** Seed list with duplicates, percent-encoding, mixed-case hosts, default
    * ports, fragments — the canonicalization cases of FIXTURES.md §2. */
  def seedUrls(spark: SparkSession, n: Long, pageCount: Long, nHosts: Int = 64): DataFrame = {
    val id = col("id")
    val target = pmod(hash(id.cast("string"), lit("seed")), lit(pageCount))
    val variant = pmod(id, lit(5))
    val base = pageUrl(target, nHosts)
    val url = when(variant === 0, base)
      .when(variant === 1, concat(lit("HTTP://SITE"), hostIdx(target, nHosts),
        lit(".EXAMPLE/page/"), target)) // uppercase scheme+host
      .when(variant === 2, concat(lit("http://site"), hostIdx(target, nHosts),
        lit(".example:80/page/"), target)) // default port
      .when(variant === 3, concat(base, lit("#section-2"))) // fragment
      .otherwise(concat(lit("http://site"), hostIdx(target, nHosts),
        lit(".example/%70age/"), target)) // %70 = 'p' (unreserved decode)
    val priority = round(pmod(hash(id.cast("string"), lit("prio")), lit(1000))
      .cast("double") / 100.0, 2)
    spark.range(n).select(url.as("url"), priority.as("priority"))
  }

  /** robots rules: every 7th host disallows its /page/1* range. */
  def robots(spark: SparkSession, nHosts: Int = 64): DataFrame = {
    spark.range(nHosts)
      .select(concat(lit("site"), col("id"), lit(".example")).as("host"),
        when(pmod(col("id"), lit(7)) === 0, array(lit("/page/1")))
          .otherwise(array().cast("array<string>")).as("disallowed"))
  }
}
