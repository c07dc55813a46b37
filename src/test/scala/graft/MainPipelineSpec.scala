package graft

import graft.core.C5Schema
import graft.pipeline.{Formatters, MainPipeline}

import org.apache.spark.sql.functions._

class MainPipelineSpec extends SparkSpecBase {

  private def fetchedDocs() = {
    import spark.implicits._
    Seq(
      // licensed English page
      ("doc-1", "CC-MAIN-2024-10", "http://siteA.example/a", "2024-03-01",
        "warc/a.warc.gz",
        """<html><head><link rel="license" href="https://creativecommons.org/licenses/by/4.0/"></head>
          |<body><p>The cat sat on the mat and it is happy. The dog is in the garden for the day.</p></body></html>""".stripMargin),
      // licensed page with an email + symbol line (formatter checks)
      ("doc-2", "CC-MAIN-2024-10", "http://siteB.example/b", "2024-03-01",
        "warc/b.warc.gz",
        """<html><body><a href="https://creativecommons.org/licenses/by-sa/3.0/">CC</a>
          |<p>Contact me at jane.doe@example.com for the data and the code of it.</p>
          |<p>| | |</p></body></html>""".stripMargin),
      // no license → dropped by F4
      ("doc-3", "CC-MAIN-2024-10", "http://siteC.example/c", "2024-03-01",
        "warc/c.warc.gz", "<html><body><p>the and of to in is</p></body></html>"),
      // license mention but parse yields none (plain text url) → dropped
      ("doc-4", "CC-MAIN-2024-10", "http://siteD.example/d", "2024-03-01",
        "warc/d.warc.gz", "<html><body><p>see creativecommons.org maybe</p></body></html>"),
      // banned domain → dropped by F1
      ("doc-5", "CC-MAIN-2024-10", "http://banned.example/e", "2024-03-01",
        "warc/e.warc.gz",
        """<html><body><a href="https://creativecommons.org/licenses/by/4.0/">CC</a><p>the it is</p></body></html>""")
    ).toDF("id", "dump", "url", "date", "file_path", "html")
  }

  test("main pipeline: C5 schema shape, filters, formatters, language") {
    val out = MainPipeline.annotate(fetchedDocs(), bannedDomains = Set("banned.example"))
    assert(out.schema.fieldNames.toSeq === C5Schema.schema.fieldNames.toSeq)
    assert(out.schema("potential_licenses").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === C5Schema.potentialLicenses.fieldNames.toSeq)
    val rows = out.orderBy(col("id")).collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("doc-1", "doc-2"))
    val r1 = rows(0)
    assert(r1.getString(6) === "by") // license_abbr
    assert(r1.getString(8) === "link_tag")
    assert(r1.getBoolean(9)) // in_head
    assert(r1.getString(18) === "en") // language
    val r2 = rows(1)
    assert(r2.getString(6) === "by-sa")
    val text2 = r2.getString(0)
    assert(text2.contains("<email>"), s"pii not scrubbed: $text2")
    assert(!text2.contains("jane.doe@example.com"))
    assert(!text2.split("\n").exists(_.matches("^[ \\t]*\\|[ \\t|]*$")), "symbol line kept")
  }

  test("per-reason drop metrics on every filter stage (A7 parity)") {
    import spark.implicits._
    // passes CC gate + license filter, fails the language threshold
    val extra = Seq(("doc-6", "CC-MAIN-2024-10", "http://siteE.example/f",
      "2024-03-01", "warc/f.warc.gz",
      """<html><body><a href="https://creativecommons.org/licenses/by/4.0/">CC</a><p>zzz qqq xxx yyy www vvv</p></body></html>"""))
      .toDF("id", "dump", "url", "date", "file_path", "html")
    val out = MainPipeline.annotate(fetchedDocs().unionByName(extra),
      bannedDomains = Set("banned.example"))
    out.collect()
    val m = out.queryExecution.observedMetrics
    assert(m("url_filter").getAs[Long]("dropped_banned_domain") === 1L)
    assert(m("cc_gate").getAs[Long]("dropped_no_cc_substring") === 1L)
    assert(m("license_filter").getAs[Long]("dropped_parse_error") === 0L)
    assert(m("license_filter").getAs[Long]("dropped_no_explicit_license") === 1L)
    assert(m("language_filter")
      .getAs[Long]("dropped_no_language_above_its_threshold") === 1L)
  }

  test("readC5: published-parquet read-back with SCHEMA_NULLABLE; fine/strict run on it") {
    import graft.pipeline.Postprocess
    val c5 = MainPipeline.annotate(fetchedDocs(), bannedDomains = Set("banned.example"))
      .withColumn("found_in_fw",
        when(col("id") === "doc-1", lit(true)).otherwise(lit(false)))
    val dir = java.nio.file.Files.createTempDirectory("c5out").toString
    MainPipeline.write(c5, dir)
    val back = Postprocess.readC5(spark, s"$dir/lang_dir=en_Latn")
    assert(back.schema === C5Schema.schemaNullable)
    assert(back.count() === 2)
    val fine = Postprocess.fineVersion(back)
    assert(fine.collect().map(_.getAs[String]("id")).toSeq === Seq("doc-1"))
    assert(!fine.columns.contains("found_in_fw"))
    assert(Postprocess.strictVersion(back).count() === 1) // doc-1: by, no wiki, no nc
  }

  test("empty-text filter and distributed set equality") {
    import spark.implicits._
    val df = Seq(("a", "real text"), ("b", "   "), ("c", ""), ("d", "\t\n"),
      ("e", "x")).toDF("id", "text")
    // F3: whitespace-only and empty rows drop; note Spark trim strips 0x20
    // only, so the tab/newline row is kept — same as trim(text) <> ''
    val kept = MainPipeline.emptyTextFilter(df).select("id")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(kept === Seq("a", "d", "e"))
    // U3: set equality as distributed except-emptiness, multiset-sensitive
    val x = Seq(1, 2, 3).toDF("v")
    val y = Seq(3, 2, 1).toDF("v")
    val z = Seq(1, 2).toDF("v")
    assert(MainPipeline.setEquals(x, y))
    assert(!MainPipeline.setEquals(x, z))
    assert(!MainPipeline.setEquals(z, x))
  }

  test("containment join + overwrite_with_none constant fold") {
    import spark.implicits._
    val c5 = MainPipeline.annotate(fetchedDocs(), bannedDomains = Set("banned.example"))
    val keys = Seq(("CC-MAIN-2024-10", "doc-1")).toDF("dump", "id")
    val joined = MainPipeline.withContainment(c5, keys, overwriteWithNone = false)
      .select(col("id"), col("found_in_fw")).orderBy(col("id")).collect()
    assert(joined.map(r => (r.getString(0), r.getBoolean(1))).toSeq ===
      Seq(("doc-1", true), ("doc-2", false)))
    val noned = MainPipeline.withContainment(c5, keys, overwriteWithNone = true)
    assert(noned.filter(col("found_in_fw").isNotNull).count() === 0)
  }

  test("partitioned write produces language-keyed directories") {
    val dir = java.nio.file.Files.createTempDirectory("c5out").toString
    MainPipeline.write(
      MainPipeline.annotate(fetchedDocs(), bannedDomains = Set("banned.example")), dir)
    val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("lang_dir="))
    assert(parts.contains("lang_dir=en_Latn"))
    val back = spark.read.parquet(dir)
    assert(back.count() === 2)
  }

  test("formatters: pii, symbol lines, mojibake") {
    import spark.implicits._
    val df = Seq(
      ("reach me: bob@x.co or 10.1.2.3 now", "a"),
      ("good line\n| | |\nnext", "b"),
      ("cafÃ©", "c") // "cafÃ©" mojibake for café
    ).toDF("t", "k")
    val out = df.select(col("k"),
      Formatters.scrubPii(col("t")).as("pii"),
      Formatters.stripSymbolLines(col("t")).as("sym"),
      Formatters.fixText(col("t")).as("fix"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(out("a")._1 === "reach me: <email> or <ip> now")
    assert(out("b")._2 === "good line\n\nnext")
    assert(out("c")._3 === "café")
  }
}
