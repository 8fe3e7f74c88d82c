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

  test("sharded seen-gate: no false negatives, one corpus pass, agrees with the single filter") {
    val corpus = (0L until 2000L).map(i => (i, s"doc body number $i")).toDF("doc_id", "text")
    // batch: 100 exact dups + 100 new docs
    val batch = ((0L until 100L).map(i => (10000L + i, s"doc body number $i")) ++
      (0L until 100L).map(i => (20000L + i, s"fresh text $i")))
      .toDF("doc_id", "text")
    val sharded = BloomJoin.seenGateSharded(batch, corpus, shards = 4,
      expectedItemsPerShard = 1000L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("maybe_seen")).toMap
    // bloom guarantee: every true dup is flagged, whatever its shard
    (0L until 100L).foreach(i => assert(sharded(10000L + i), s"dup $i missed"))
    // effectiveness: the overwhelming majority of new docs pass
    val fp = (0L until 100L).count(i => sharded(20000L + i))
    assert(fp <= 10, s"$fp of 100 new docs false-positived")
    // and the single-filter gate flags the same true dups
    val single = BloomJoin.seenGate(batch, corpus, expectedItems = 4000L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("maybe_seen")).toMap
    (0L until 100L).foreach(i => assert(single(10000L + i)))
  }

  test("persisted filter bank: append path flags dups of both installments") {
    val partA = (0L until 1000L).map(i => (i, s"doc body number $i")).toDF("doc_id", "text")
    val partB = (1000L until 1500L).map(i => (i, s"doc body number $i")).toDF("doc_id", "text")
    BloomJoin.writeSeenFilters(partA, "graft_seen_spec", shards = 4,
      expectedItemsPerShard = 1000L)
    BloomJoin.appendToSeenFilters(partB, "graft_seen_spec")
    // probe: dups of A, dups of appended B, and fresh docs
    val batch = ((0L until 50L).map(i => (30000L + i, s"doc body number $i")) ++
      (0L until 50L).map(i => (31000L + i, s"doc body number ${1000L + i}")) ++
      (0L until 100L).map(i => (32000L + i, s"fresh text $i"))).toDF("doc_id", "text")
    val gated = BloomJoin.seenGateFromTable(batch, "graft_seen_spec").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("maybe_seen")).toMap
    (0L until 50L).foreach { i =>
      assert(gated(30000L + i), s"dup of built doc $i missed")
      assert(gated(31000L + i), s"dup of APPENDED doc ${1000 + i} missed")
    }
    val fp = (0L until 100L).count(i => gated(32000L + i))
    assert(fp <= 10, s"$fp of 100 new docs false-positived")
    // and the persisted bank answers exactly like the one-shot sharded gate
    val direct = BloomJoin.seenGateSharded(batch, partA.union(partB), shards = 4,
      expectedItemsPerShard = 1000L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("maybe_seen")).toMap
    assert(gated == direct)
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
