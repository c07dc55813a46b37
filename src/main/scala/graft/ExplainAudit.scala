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
      "q_topk_groups", "q_license_extract", "q_frontier_schedule", "q_ann_topk")
    names.foreach { n =>
      println(s"\n================ $n ================")
      Queries.all(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
