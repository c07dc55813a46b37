package graft.core

import org.apache.spark.sql.SparkSession

/** Shared reader for the engine's size-threshold knobs: a runtime-settable
  * Spark conf key overrides an environment variable overrides the default.
  * One implementation so precedence and parsing cannot drift between the
  * broadcast/build gates that use it. */
object GraftConf {
  def longKnob(spark: SparkSession, confKey: String, envKey: String,
      default: Long): Long =
    spark.conf.getOption(confKey)
      .orElse(sys.env.get(envKey))
      .map(_.toLong).getOrElse(default)
}
