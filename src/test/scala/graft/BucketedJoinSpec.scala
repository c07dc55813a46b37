package graft

import org.apache.spark.sql.functions._

/** Scale posture check (SURVEY §7.1, build brief "co-located joins via
  * bucketing"): two tables bucketed on the join key join WITHOUT a shuffle
  * exchange — the plan that keeps a repeated frontier↔seen-set or
  * fact↔containment join exchange-free across epochs at 100 TB. */
class BucketedJoinSpec extends SparkSpecBase {

  test("bucketed tables join without shuffle exchange") {
    import spark.implicits._
    // default warehouse (./spark-warehouse) — warehouse.dir is a static conf
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val a = (0L until 10000L).map(i => (i, s"u$i")).toDF("k", "va")
      val b = (0L until 10000L by 2).map(i => (i, i * 2)).toDF("k", "vb")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_a")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_b")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join shuffled:\n$plan")
      assert(joined.count() === 5000)
      // sanity: the same join WITHOUT bucketing does shuffle
      val plain = a.join(b, Seq("k"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
