package graft

import org.apache.spark.sql.functions._

/** One-shot plan dump for the KMV operators (scratch aid, not a spec). */
object KmvPlanDrive {
  def main(args: Array[String]): Unit = {
    val s = Graft.session(master = "local[8]")
    val dir = "/root/testdata/sf0.01"
    val prof = operators.Sketches.profile(Tables.t(s, dir, "orders"), Seq(
      "o_orderkey" -> col("o_orderkey"),
      "o_orderstatus" -> col("o_orderstatus")))
    println("=== profile plan ===")
    println(prof.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    val kmv = operators.Sketches.kmvSourceOps(Tables.t(s, dir, "documents"))
    println("=== kmv plan ===")
    println(kmv.queryExecution.executedPlan.toString.linesIterator.take(60).mkString("\n"))
    s.stop()
  }
}
