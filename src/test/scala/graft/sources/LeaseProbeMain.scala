package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * Forked-JVM half of [[WriterLeaseSpec]]'s two-process scenario: a
 * SECOND DRIVER pointed at the same warehouse attempts a writer op on
 * a table the first driver holds the writer lease for. Exit codes:
 *
 *  - 7: the writer op threw ConcurrentModificationException (the
 *       lease worked — loud failure, no mutation);
 *  - 0: the write WENT THROUGH (the silent data-loss hole the lease
 *       exists to close — the spec fails on this);
 *  - 1: any other error (spec fails with the probe's stderr).
 */
object LeaseProbeMain {
  def main(args: Array[String]): Unit = {
    val warehouse = args(0)
    val table = args(1)
    try {
      val spark = SparkSession.builder().master("local[2]")
        .appName("graft-lease-probe")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", warehouse)
        .getOrCreate()
      import spark.implicits._
      val df = Seq((1L, "intruder")).toDF("id", "v")
      val code =
        try { Bucketing.writeBucketed(df, table, "id", 2); 0 }
        catch { case _: java.util.ConcurrentModificationException => 7 }
      spark.stop()
      System.exit(code)
    } catch {
      case t: Throwable => t.printStackTrace(); System.exit(1)
    }
  }
}
