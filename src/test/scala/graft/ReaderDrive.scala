package graft

import graft.pipeline.{ExecutionBuilder, Reader}

/** Consumer-style drive of the Reader error channel (run via Test/runMain graft.ReaderDrive). */
object ReaderDrive {
  def main(args: Array[String]): Unit = {
    val sp = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    val rd = new Reader[Long] {
      def numPartitions = 2
      def read(p: Int) = Iterator.range(0, 6).map(i =>
        if (i == 2) throw new RuntimeException(s"boom $p") else p * 10L + i)
    }
    val res = ExecutionBuilder.reader(sp, rd).collect().run()
    println(s"READER-> results=${res.results.sorted} errors=${res.errors.sorted}")
    sp.stop()
  }
}
