package graft

import org.apache.spark.sql.functions._

/** Scale evidence for the hot-host fetch join: when one join key carries
  * most of the rows (a mega-host frontier), AQE's skew-join splits the
  * oversized partition at runtime instead of serializing the epoch behind
  * one straggler task. The politeness window is already salted by
  * construction ([[graft.frontier.Scheduler]]); this spec pins the OTHER
  * skew defense — the runtime re-plan — so a Spark-config regression that
  * silently disables it fails a test instead of a 100 TB run. */
class AqeSkewSpec extends SparkSpecBase {

  test("AQE splits the skewed side of a hot-key shuffle join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of the left side hashes to one host key
      val hot = (0 until 60000).map(i => ("hot.example", s"http://hot.example/p/$i"))
      val cold = (0 until 3000).map(i => (s"cold${i % 60}.example", s"http://cold/p/$i"))
      val frontier = (hot ++ cold).toDF("host", "url").repartition(8)
      val robots = (0 until 61).map(i =>
        (if (i == 60) "hot.example" else s"cold$i.example", s"meta-$i")).toDF("host", "meta")
      val joined = frontier.join(robots, Seq("host"))
      // execute THIS dataframe's query execution (count() would plan a new one)
      assert(joined.collect().length === 63000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join; plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
