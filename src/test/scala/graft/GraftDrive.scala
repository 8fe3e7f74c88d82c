package graft

import org.apache.spark.sql.functions._

/** Consumer-style drive of the Graft session facade (Test/runMain graft.GraftDrive). */
object GraftDrive {
  def main(args: Array[String]): Unit = {
    val sp = Graft.session(master = "local[4]")
    val slot = sp.sql("SELECT crc16_slot('123456789') AS s").head().getInt(0)
    val topk = relational.Relational.topKPerKey(
      Tables.t(sp, "/root/testdata/sf0.001", "orders"),
      Seq(col("o_orderstatus")), Seq(col("o_totalprice").desc), 2).count()
    println(s"GRAFT-> slot=$slot topk_rows=$topk")
    sp.stop()
  }
}
