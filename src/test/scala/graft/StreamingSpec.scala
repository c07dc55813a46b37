package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{FrontierRow, ScheduledRow}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpecBase {

  test("politeness state holds across micro-batches (per-host lifetime budget)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FrontierRow]
    val scheduled = StreamingOps.politenessStream(input.toDS(), budgetPerHost = 3)
    val q = scheduled.writeStream
      .format("memory").queryName("sched_stream")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: host a gets 5 candidates → only 3 emitted
      input.addData((1 to 5).map(i => FrontierRow(s"http://a/$i", "a", i.toDouble)): _*)
      q.processAllAvailable()
      // batch 2: host a gets more → 0 emitted (budget exhausted); host b → 2
      input.addData(FrontierRow("http://a/9", "a", 9.0),
        FrontierRow("http://b/1", "b", 1.0), FrontierRow("http://b/2", "b", 2.0))
      q.processAllAvailable()
      val rows = spark.table("sched_stream").as[ScheduledRow].collect()
      val aRows = rows.filter(_.host == "a")
      assert(aRows.length === 3)
      // highest priority first within the first batch
      assert(aRows.map(_.url).toSet === Set("http://a/5", "http://a/4", "http://a/3"))
      assert(rows.count(_.host == "b") === 2)
      assert(aRows.map(_.hostSlot).sorted.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming seen dedup: first arrival per url_hash wins across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FrontierRow]
    val deduped = StreamingOps.seenDedupStream(input.toDS())(
      r => graft.functions.TextHashing.splitmix64(r.url.hashCode.toLong))
    val q = deduped.writeStream
      .format("memory").queryName("seen_stream")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: u1 twice (different priorities) + u2 → u1 emitted ONCE with
      // the better rank, u2 once
      input.addData(
        FrontierRow("http://u1", "h", 1.0),
        FrontierRow("http://u1", "h", 9.0),
        FrontierRow("http://u2", "h", 2.0))
      q.processAllAvailable()
      // batch 2: u1 again (later arrival — dropped), u3 new (emitted)
      input.addData(
        FrontierRow("http://u1", "h", 99.0),
        FrontierRow("http://u3", "h", 3.0))
      q.processAllAvailable()
      val rows = spark.table("seen_stream").as[FrontierRow].collect()
      assert(rows.map(_.url).sorted.toSeq ===
        Seq("http://u1", "http://u2", "http://u3"))
      // u1's single emission carried the in-batch rank winner (priority 9.0),
      // and batch 2's 99.0 re-arrival did NOT replace it
      assert(rows.find(_.url == "http://u1").get.priority === 9.0)
    } finally q.stop()
  }

  test("politeness stream hot host: bounded heap picks the exact global top-N in rank order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FrontierRow]
    val scheduled = StreamingOps.politenessStream(input.toDS(), budgetPerHost = 7)
    val q = scheduled.writeStream
      .format("memory").queryName("sched_hot")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // one hot host, 5000 rows in a single micro-batch, adversarial order
      // (descending-ish with duplicate priorities to exercise the url tiebreak)
      val rows = (0 until 5000).map(i =>
        FrontierRow(f"http://hot/p$i%05d", "hot", (i % 100).toDouble))
      input.addData(scala.util.Random.shuffle(rows): _*)
      q.processAllAvailable()
      val got = spark.table("sched_hot").as[ScheduledRow].collect()
        .sortBy(_.hostSlot)
      val expected = rows.sortBy(r => (-r.priority, r.url)).take(7)
      assert(got.map(_.url).toSeq === expected.map(_.url).toSeq,
        "heap selection must equal sort-take in rank order")
      assert(got.map(_.hostSlot).toSeq === (1L to 7L))
    } finally q.stop()
  }

  test("frontier file stream drains committed snapshots with AvailableNow") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("fstream").toString
    val table = new graft.table.SnapshotTable(root, spark)
    table.commit(Seq(("http://a/1", 1.0), ("http://a/2", 2.0)).toDF("url", "priority"))
    table.commit(Seq(("http://b/1", 3.0)).toDF("url", "priority"))
    val stream = StreamingOps.frontierFileStream(spark, root)
    val q = stream.writeStream.format("memory").queryName("frontier_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val urls = spark.table("frontier_stream").select("url")
      .as[String].collect().sorted.toSeq
    // drains ALL snapshot data dirs (s1 + s2 — the stream sees history)
    assert(urls === Seq("http://a/1", "http://a/2", "http://b/1"))
  }

  test("end-to-end schedule stream: AvailableNow drain equals the batch epoch schedule") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("e2estream").toString
    val table = new graft.table.SnapshotTable(root, spark)
    // canonicalization traps (case, default port, fragment, dup spellings)
    // + PRIORITY TIES within hosts, so equality can only hold if the stream
    // ranks by the batch contract (priority DESC, url_hash ASC) — not by
    // url text — and dedups by canonical hash like normalize() does
    val rows = Seq(
      ("http://A.example/x", 2.0), ("http://a.example:80/x#frag", 5.0),
      ("http://a.example/y", 3.0), ("http://a.example/z", 3.0),
      ("http://a.example/w", 3.0), ("http://a.example/q", 1.0),
      ("http://b.example/1", 1.0), ("http://b.example/2", 1.0),
      ("http://b.example/3", 1.0), ("http://c.example/only", 7.0))
    table.commit(rows.take(6).toDF("url", "priority"))
    // DELTA commit: table content = all 10 rows (what the batch twin reads),
    // and the stream sees the same rows as two snapshot files
    table.commitDelta(rows.drop(6).toDF("url", "priority"))
    val budget = 2
    // batch twin: full Scheduler on the same raw frontier, empty seen set
    val seen = new graft.frontier.SeenSet(
      java.nio.file.Files.createTempDirectory("e2eseen").toString, spark)
    val batch = graft.frontier.Scheduler.scheduleEpoch(
      table.read().select("url", "priority"), seen, None, budgetPerHost = budget)
      .select(col("canon_url"), col("host"), col("priority"), col("host_rank"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val q = StreamingOps.epochScheduleStream(spark, root, budgetPerHost = budget)
      .writeStream.format("memory").queryName("e2e_sched")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("e2e_sched").as[ScheduledRow].collect()
      .map(r => (r.url, r.host, r.priority, r.hostSlot.toInt)).toSet
    assert(streamed === batch,
      s"stream ${streamed.toSeq.sorted} != batch ${batch.toSeq.sorted}")
    assert(streamed.nonEmpty && streamed.size === batch.size)
  }

  test("watermarked windowed counts over an event stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val counts = StreamingOps.windowedEventCounts(events, "10 minutes", "5 minutes")
    val q = counts.writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData((ts(1), "click"), (ts(2), "click"), (ts(11), "view"))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      input.addData((ts(40), "click"))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select(col("event_type"), col("n")).as[(String, Long)].collect().toSet
      assert(rows.contains(("click", 2L))) // 10:00-10:10 window closed with 2 clicks
      assert(rows.contains(("view", 1L)))
    } finally q.stop()
  }
}
