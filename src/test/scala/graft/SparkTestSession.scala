package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (spark_guide: session per suite, not per test). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // per-process warehouse (the Verify.scala discipline): two
    // concurrent test JVMs sharing ./spark-warehouse race each
    // other's catalog tables — reproduced as 1 spurious failure per
    // run in the round-6 judge pass
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-test-wh").toString)
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
}
