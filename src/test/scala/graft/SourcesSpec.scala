package graft

import graft.sources.{RobustSources, WarcSource}
import graft.sources.WarcSource.WarcRecord

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

class SourcesSpec extends SparkSpecBase {

  private def mkRecords(n: Int, fileTag: String): Seq[WarcRecord] =
    (0 until n).map { i =>
      WarcRecord(
        file_path = "",
        record_id = s"<urn:uuid:$fileTag-rec-$i>",
        warc_type = if (i % 4 == 0) "request" else "response",
        target_uri = s"http://site$i.example/p/$i",
        warc_date = "2024-03-01T00:00:00Z",
        content = s"HTTP/1.1 200 OK\r\n\r\n<html><body>doc $fileTag $i</body></html>")
    }

  test("warc: gzip round-trip, response filter, per-file limit") {
    val dir = Files.createTempDirectory("warc").toString
    val recs0 = mkRecords(20, "f0")
    val recs1 = mkRecords(12, "f1")
    Files.write(Paths.get(dir, "part0.warc.gz"), WarcSource.warcGzBytes(recs0))
    Files.write(Paths.get(dir, "part1.warc.gz"), WarcSource.warcGzBytes(recs1))
    val all = WarcSource.read(spark, dir).collect()
    val expected = (recs0 ++ recs1).filter(_.warc_type == "response")
    assert(all.length === expected.length)
    assert(all.map(_.record_id).toSet === expected.map(_.record_id).toSet)
    val one = all.find(_.record_id == "<urn:uuid:f0-rec-1>").get
    assert(one.content.contains("doc f0 1"))
    assert(one.target_uri === "http://site1.example/p/1")
    // per-FILE limit (reference limit is per task, script_utils.py:147-148)
    val limited = WarcSource.read(spark, dir, perFileLimit = 2).collect()
    assert(limited.length === 4) // 2 per file × 2 files
  }

  test("warc: truncated gzip tail is tolerated (robust read)") {
    val dir = Files.createTempDirectory("warctrunc").toString
    val bytes = WarcSource.warcGzBytes(mkRecords(10, "t"))
    Files.write(Paths.get(dir, "trunc.warc.gz"), bytes.dropRight(40))
    val got = WarcSource.read(spark, dir).collect()
    assert(got.length < 10 && got.nonEmpty) // leading records survive, no task failure
  }

  test("robust jsonl: malformed lines dropped, empty dir tolerated") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val dir = Files.createTempDirectory("jsonl").toString
    Files.write(Paths.get(dir, "a.jsonl"),
      """{"id":1,"name":"x"}
        |this is not json
        |{"id":2,"name":"y"}
        |{"id":,,}
        |""".stripMargin.getBytes)
    val df = RobustSources.robustJsonl(spark, dir, schema)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    val empty = RobustSources.robustJsonl(
      spark, Files.createTempDirectory("jsonl-empty").toString, schema)
    assert(empty.count() === 0)
    assert(empty.schema === schema)
  }

  test("per-partition limit semantics (reference per-task limit)") {
    import spark.implicits._
    val df = spark.range(100).repartition(4).toDF("id")
    val limited = RobustSources.perPartitionLimit(df, 5)
    assert(limited.count() === 20) // 5 × 4 partitions, NOT a global 5
  }
}
