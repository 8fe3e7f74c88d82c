package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.relational.Relational

/** Custom TopKPerKey operator: equivalence with the window formulation + plan shape. */
class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = (1 to 1000).map { i =>
    (s"g${i % 7}", i.toLong, (i * 37 % 1000).toDouble)
  }.toDF("g", "id", "score").repartition(8)

  test("topKPerKey equals window row_number for every k") {
    for (k <- Seq(1, 3, 10)) {
      val custom = Relational.topKPerKey(df,
        Seq(col("g")), Seq(col("score").desc, col("id").asc), k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
      val expected = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(custom === expected, s"k=$k")
    }
  }

  test("keys with fewer than k rows emit all their rows") {
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "id")
    val got = Relational.topKPerKey(tiny, Seq(col("g")), Seq(col("id").desc), 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("physical plan: two heap phases around exactly one exchange, no sort") {
    val plan = Relational.topKPerKey(df, Seq(col("g")), Seq(col("score").desc), 2)
      .queryExecution.executedPlan.toString
    // TreeNode.nodeName strips the "Exec" suffix: the physical node prints as TopKPerKey
    assert("TopKPerKey \\[".r.findAllIn(plan).size === 2, s"want 2 heap phases in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"))
    assert(!plan.contains("Sort "), s"unexpected sort in:\n$plan")
  }

  test("ascending order picks minima") {
    val got = Relational.topKPerKey(df, Seq(col("g")), Seq(col("score").asc, col("id").asc), 1)
      .select("g", "score").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expected = df.groupBy("g").agg(min("score")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === expected)
  }
}
