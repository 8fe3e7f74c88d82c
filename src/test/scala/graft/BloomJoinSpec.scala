package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin

/** Bloom pre-filter is transparent: join results are identical, and the probe is codegen'd. */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("preFilteredJoin ≡ plain inner join") {
    val fact = (0L until 5000L).map(i => (i % 997, i)).toDF("k", "payload")
    val dim = (0L until 997L by 13).map(i => (i, s"d$i")).toDF("dk", "name")
    val plain = fact.join(dim, $"k" === $"dk")
    val bloomed = BloomJoin.preFilteredJoin(fact, dim, "k", "dk")
    assert(bloomed.count() == plain.count())
    assert(bloomed.select("k", "payload", "dk", "name").except(
      plain.select("k", "payload", "dk", "name")).isEmpty)
  }

  test("the probe appears as a codegen'd filter before the join") {
    // must be a real scan: over a LocalRelation the optimizer
    // constant-folds the probe away (ConvertToLocalRelation), which
    // hides the very filter this test pins
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_bloom_fact"
    (0L until 100L).map(i => (i, i)).toDF("k", "p")
      .write.mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Seq((1L, "a"), (2L, "b")).toDF("dk", "n")
    val plan = BloomJoin.preFilteredJoin(fact, dim, "k", "dk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
  }
}
