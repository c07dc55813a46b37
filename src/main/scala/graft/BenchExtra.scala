package graft

import org.apache.spark.sql.SparkSession

/** Supplementary measurement main (guide §1: measure first; §1.4 noop-sink
  * isolation). NOT part of the driver contract — `graft.Bench` is frozen and
  * unchanged; this main exists so optimization rounds can attribute each
  * query's cost to one-off work (planning + whole-stage-codegen/janino +
  * JIT: `cold - warm`) vs steady-state per-row work (`warm`), and dump
  * `.explain("formatted")` plans, without touching the judged harness.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchExtra"
  * Knobs:
  *   SPARK_GRAFT_EXTRA_QUERIES=a,b,c  subset (default: all)
  *   SPARK_GRAFT_EXTRA_REPS=N         warm repetitions (default 2)
  *   SPARK_GRAFT_EXTRA_PLANS=dir      write <dir>/<name>.txt explain dumps
  *   SPARK_GRAFT_EXTRA_NOOP=1         use noop-sink writes instead of count()
  *                                    (Bench methodology is count(); default
  *                                    stays count() for comparability)
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cpusInt = scala.util.Try(cpus.trim.toInt).toOption
    val shmBase = {
      val p = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isWritable(p)) "/dev/shm/graft-bench-extra" else null
    }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpusInt.getOrElse(32).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2": extra session confs for A/B
    // attribution experiments (e.g. disabling codegen to isolate janino
    // cost). Diagnostic only — the judged Bench sets none of these.
    val extraConf = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(";").toSeq.filter(_.contains("=")))
      .getOrElse(Nil)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val builder2 = extraConf.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
    val spark = (if (shmBase != null) builder2.config("spark.local.dir", shmBase)
      else builder2).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val subset = sys.env.get("SPARK_GRAFT_EXTRA_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "2").toInt
    val plansDir = sys.env.get("SPARK_GRAFT_EXTRA_PLANS")
    val useNoop = sys.env.get("SPARK_GRAFT_EXTRA_NOOP").contains("1")
    plansDir.foreach(d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => subset.forall(_.contains(n)))
    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"extra:$name")
      def runOnce(): Unit = {
        val df = fn(spark, sfDir)
        if (useNoop) df.write.format("noop").mode("overwrite").save()
        else df.count()
      }
      val cold = time(runOnce())
      val warms = (1 to reps).map(_ => time(runOnce()))
      plansDir.foreach { d =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"$name.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      val warmMin = warms.min
      System.err.println(
        f"[extra] $name%-24s cold $cold%7.3f  warm ${warms.map(w => f"$w%.3f").mkString("/")}  oneoff ${cold - warmMin}%7.3f")
      f""""$name":{"cold":$cold%.3f,"warm":$warmMin%.3f,"oneoff":${cold - warmMin}%.3f}"""
    }
    println(rows.mkString("{\"extra\":{", ",", "}}"))
    spark.stop()
  }
}
