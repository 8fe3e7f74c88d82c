package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cumulativeSums equals the driver-computed global prefix sums across partitions") {
    // 1000 rows over the default 32-way range partitioning — many
    // partitions, so the broadcast prefix offsets genuinely engage
    val rows = (1L to 1000L).map(i => (i, i % 7 + 1))
    val df = rows.toDF("k", "v").repartition(8) // scrambled input
    val got = Relational.cumulativeSums(df, Seq(col("k").asc), Seq((col("v"), "cum")))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cum")).toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (k, v) =>
      acc += v
      assert(got(k) === acc, s"cumulative sum diverges at k=$k")
    }
  }

  test("cumulativeSums: multiple running totals share one partitioning (rank via lit(1))") {
    val df = Seq(("c", 5L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    val out = Relational.cumulativeSums(df, Seq(col("v").desc),
      Seq((col("v"), "cum"), (lit(1L), "rank")))
      .collect().map(r => (r.getString(0), r.getAs[Long]("cum"), r.getAs[Long]("rank")))
      .sortBy(_._3)
    assert(out === Seq(("c", 5L, 1L), ("b", 8L, 2L), ("a", 10L, 3L)))
  }
}
