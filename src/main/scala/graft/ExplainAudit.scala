package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor (developer tool): prints formatted physical plans for
  * representative queries so pushdown/broadcast/codegen can be inspected —
  * the ".explain and iterate" loop the build guidelines require. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_agg", "q_containment_join", "q_anti_join", "q_minlen_filter",
      "q_topk_groups", "q_license_extract", "q_frontier_schedule", "q_ann_topk",
      "q_dedup_phash")
    names.foreach { n =>
      println(s"\n================ $n ================")
      Queries.all(n)(spark, sfDir).explain("formatted")
    }

    // crawl-epoch stage plans with a NON-EMPTY seen set (the per-epoch
    // steady state): the schedule must show ONE scan of the frontier with
    // the codegen'd bloom probe feeding the anti-join, and the fetch join
    // must be a broadcast of the schedule (corpus side never exchanges)
    {
      import graft.frontier.{Scheduler, SeenSet}
      import org.apache.spark.sql.functions._
      graft.functions.GraftFunctions.register(spark)
      import spark.implicits._
      val root = java.nio.file.Files.createTempDirectory("audit-seen").toString
      val seen = new SeenSet(root, spark)
      seen.add((0L until 10000L).toDF("url_hash"))
      val frontier = graft.gen.SyntheticCorpus.seedUrls(spark, 20000, pageCount = 10000)
      println("\n================ crawl: schedule (seen set non-empty) ================")
      Scheduler.scheduleEpoch(frontier, seen, Some(graft.gen.SyntheticCorpus.robots(spark)),
        budgetPerHost = 5).explain("formatted")
      // robots fallback path: host count unknown/over threshold → the gate
      // join must NOT broadcast the robots side (10^8-host safety); the
      // schedule itself is byte-identical to the broadcast path (spec'd in
      // FrontierSpec "robots gate").
      println("\n================ crawl: schedule (robots hash-join fallback) ================")
      val bcastKeys = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold")
      val savedBcast = bcastKeys.map(k => k -> spark.conf.getOption(k))
      try {
        bcastKeys.foreach(spark.conf.set(_, "-1"))
        Scheduler.scheduleEpoch(frontier, seen, Some(graft.gen.SyntheticCorpus.robots(spark)),
          budgetPerHost = 5, robotsHosts = Long.MaxValue).explain("formatted")
      } finally savedBcast.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      println("\n================ crawl: fetch join (broadcast schedule) ================")
      val pages = graft.gen.SyntheticCorpus.pages(spark, 5000)
        .withColumnsRenamed(Map("url" -> "page_url"))
        .withColumn("page_hash", graft.functions.GraftFunctions.urlHash64(col("page_url")))
      val sched = Scheduler.scheduleEpoch(frontier, seen, None, budgetPerHost = 5)
      pages.join(broadcast(sched),
        col("url_hash") === col("page_hash") && col("canon_url") === col("page_url"),
        "inner").explain("formatted")

      // with tombstones: the keys side of the exact anti-join must show the
      // cuckoo probe gating a BROADCAST anti-join against the (small)
      // tombstone table — no extra scan or shuffle of the frontier
      seen.retract((0L until 100L).toDF("url_hash"))
      println("\n================ crawl: filterUnseen (tombstones active) ================")
      seen.filterUnseen(frontier
        .withColumn("url_hash", graft.functions.GraftFunctions.urlHash64(col("url"))))
        .explain("formatted")
    }
    spark.stop()
  }
}
