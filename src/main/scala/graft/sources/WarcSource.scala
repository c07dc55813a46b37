package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record source/sink — the S1 `RetryWarcReader` analog
  * (`/root/reference/src/c5/components/readers/retry_warc.py:9-116`).
  *
  * Spark-first shape: `spark.read.format("binaryFile")` lists the WARC files
  * (split planning, locality, task retry come from the scan), then a
  * per-partition record iterator parses each file's record stream. The
  * reference's resume-at-record-index after mid-file errors (`:80-101`) maps
  * to Spark task retry: the parse is deterministic and a re-run task re-emits
  * the identical records, so retries are idempotent by construction — and
  * malformed trailing bytes are tolerated (truncated-gzip robustness of
  * `yield_jsonl_gz_data_robust`, S5 analog).
  *
  * One WARC "response" record per row: (file_path, record_id, target_uri,
  * warc_type, warc_date, content). The reference's per-task `limit`
  * (`script_utils.py:147-148` — per task, NOT global) is `perFileLimit`.
  */
object WarcSource {

  final case class WarcRecord(
      file_path: String,
      record_id: String,
      warc_type: String,
      target_uri: String,
      warc_date: String,
      content: String)

  /** Serialize one record (writer side, for synthetic fixtures + round-trip
    * tests). */
  private def writeRecord(out: ByteArrayOutputStream, r: WarcRecord): Unit = {
    val body = r.content.getBytes(StandardCharsets.UTF_8)
    val header =
      s"""WARC/1.0\r
         |WARC-Type: ${r.warc_type}\r
         |WARC-Record-ID: ${r.record_id}\r
         |WARC-Target-URI: ${r.target_uri}\r
         |WARC-Date: ${r.warc_date}\r
         |Content-Length: ${body.length}\r
         |\r
         |""".stripMargin
    out.write(header.getBytes(StandardCharsets.UTF_8))
    out.write(body)
    out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
  }

  /** Write a gzip'd WARC file's bytes for a sequence of records. */
  def warcGzBytes(records: Seq[WarcRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    val buf = new ByteArrayOutputStream()
    records.foreach(writeRecord(buf, _))
    gz.write(buf.toByteArray)
    gz.close()
    bos.toByteArray
  }

  /** Lenient streaming parse of one WARC(.gz) file; malformed or truncated
    * trailing content ends the iteration instead of failing the task. */
  def parseWarc(path: String, bytes: Array[Byte]): Iterator[WarcRecord] = {
    val raw: InputStream = new java.io.ByteArrayInputStream(bytes)
    val in = new BufferedInputStream(
      if (path.endsWith(".gz")) new GZIPInputStream(raw) else raw)

    def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c >= 0 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      if (c < 0 && sb.isEmpty) null else sb.toString
    }

    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false

      private def advance(): Unit = {
        nextRec = null
        try {
          // seek the version line
          var line = readLine()
          while (line != null && !line.startsWith("WARC/")) line = readLine()
          if (line == null) { done = true; return }
          // headers
          var headers = Map.empty[String, String]
          line = readLine()
          while (line != null && line.nonEmpty) {
            val i = line.indexOf(':')
            if (i > 0) headers += (line.substring(0, i).trim.toLowerCase ->
              line.substring(i + 1).trim)
            line = readLine()
          }
          val len = headers.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
          if (len < 0) { done = true; return }
          val body = new Array[Byte](len.toInt)
          var off = 0
          while (off < len) {
            val n = in.read(body, off, (len - off).toInt)
            if (n < 0) { done = true; return } // truncated → stop cleanly
            off += n
          }
          nextRec = WarcRecord(
            file_path = path,
            record_id = headers.getOrElse("warc-record-id", ""),
            warc_type = headers.getOrElse("warc-type", ""),
            target_uri = headers.getOrElse("warc-target-uri", ""),
            warc_date = headers.getOrElse("warc-date", ""),
            content = new String(body, StandardCharsets.UTF_8))
        } catch {
          case _: Exception => done = true // robust: count-and-skip semantics
        }
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Read `response` records from all WARC files under `dir`.
    *
    * @param perFileLimit per-FILE record cap (reference `limit` is per task,
    *                     `script_utils.py:147-148`); -1 = unlimited
    */
  def read(spark: SparkSession, dir: String, glob: String = "*.warc.gz",
      warcType: String = "response", perFileLimit: Int = -1): Dataset[WarcRecord] = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))
    bin.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      val it = parseWarc(path, bytes).filter(_.warc_type == warcType)
      if (perFileLimit >= 0) it.take(perFileLimit) else it
    }
  }
}
