package graft

import org.apache.spark.sql.SparkSession

/**
 * One-call session entry point for engine users: a SparkSession wired
 * the way every graft component expects — AQE on, UTC, sane local
 * shuffle parallelism, all custom expressions SQL-registered and the
 * custom planner strategies injected.
 *
 * Cluster deployments can instead set
 * `spark.sql.extensions=graft.GraftExtensions` on any session builder
 * of their own.
 */
object Graft {

  def session(master: String = "local[*]", shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    attach(spark)
    spark
  }

  /** Wire graft's functions + strategies onto an existing session. */
  def attach(spark: SparkSession): SparkSession = {
    GraftExtensions.register(spark)
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    spark
  }
}
