package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Optimization-round tooling: time one declared query (or an inline
 * variant) under session-conf variations, min-of-N, with a noop-style
 * count action — the guide §1 isolation loop without touching Bench.
 *
 * Usage: OptProbe <sfDir> <reps> <query1,query2,...> [conf1=v1,conf2=v2]
 */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val confs = if (args.length > 3)
      args(3).split(",").map(_.split("=", 2)).collect { case Array(k, v) => (k, v) }.toSeq
    else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Bench.shmLocalDir)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-optprobe-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => spark.conf.set(k, v); println(s"[optprobe] conf $k=$v") }
    Tables.t(spark, sfDir, "lineitem").count() // warm-up

    // special mode: co-occurrence edge build + kcore/ktruss phases
    if (names.sameElements(Array("graph_phases"))) {
      import graft.operators.Graph
      def time(tag: String)(f: => Any): Unit = {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
        }
        println(f"[optprobe] $tag min=${ts.map(_._1).min}%.3f " +
          f"all=${ts.map(t => f"${t._1}%.3f").mkString(",")} last=${ts.last._2}")
      }
      val li = Tables.t(spark, sfDir, "lineitem").filter(col("l_orderkey") % 10 === 0)
      time("edges_build")(
        Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey").count())
      val edges = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey").localCheckpoint()
      time("kcore")(Graph.kCore(edges, k = 8).count())
      time("ktruss")(Graph.kTruss(edges, k = 5).count())
      time("triangles")(Graph.triangleCount(edges).count())
      time("bfs")(Graph.bfsDistances(edges,
        edges.agg(min(col("src")).as("node")), maxDepth = 3).count())
      time("communities")(Graph.labelPropagation(edges, iters = 3).count())
      spark.stop(); return
    }

    // special mode: LPA old-vs-new in one JVM
    if (names.sameElements(Array("lpa_ab"))) {
      import graft.operators.Graph
      import graft.core.Materialize.MaterializeOps
      def time(tag: String)(f: => Any): Unit = {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
        }
        println(f"[optprobe] $tag min=${ts.map(_._1).min}%.3f " +
          f"all=${ts.map(t => f"${t._1}%.3f").mkString(",")} last=${ts.last._2}")
      }
      val li = Tables.t(spark, sfDir, "lineitem").filter(col("l_orderkey") % 10 === 0)
      val edges0 = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey").localCheckpoint()
      def oldLpa(iters: Int): org.apache.spark.sql.DataFrame = {
        val edges = edges0.repartition(col("src")).materializeRound
        var labels = edges.select(col("src").as("node")).distinct()
          .withColumn("label", col("node"))
        for (i <- 1 to iters) {
          labels = edges.join(labels, edges("src") === labels("node"))
            .groupBy(col("dst").as("node2"))
            .agg(mode(col("label"), deterministic = true).as("label"))
            .select(col("node2").as("node"), col("label"))
        }
        labels
      }
      time("lpa_old")(oldLpa(3).groupBy("label").agg(count(lit(1))).count())
      time("lpa_new")(Graph.labelPropagation(edges0, iters = 3)
        .groupBy("label").agg(count(lit(1))).count())
      time("lpa_old2")(oldLpa(3).groupBy("label").agg(count(lit(1))).count())
      time("lpa_new2")(Graph.labelPropagation(edges0, iters = 3)
        .groupBy("label").agg(count(lit(1))).count())
      spark.stop(); return
    }

    // special mode: sssp phases
    if (names.sameElements(Array("sssp_phases"))) {
      import graft.operators.Graph
      def time(tag: String)(f: => Any): Unit = {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
        }
        println(f"[optprobe] $tag min=${ts.map(_._1).min}%.3f " +
          f"all=${ts.map(t => f"${t._1}%.3f").mkString(",")} last=${ts.last._2}")
      }
      val li = Tables.t(spark, sfDir, "lineitem").filter(col("l_orderkey") % 10 === 0)
        .select("l_orderkey", "l_partkey").distinct()
      val g = li.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .filter(col("n").between(2, 1000)).select("l_orderkey")
      val li2 = li.join(g, "l_orderkey")
      def wEdgesSelfJoin = li2.as("a").join(li2.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("src"), col("dst"), round(lit(1.0) / col("cnt"), 6).as("w"))
      def wEdgesPosting = li2.groupBy("l_orderkey")
        .agg(collect_list(col("l_partkey")).as("items"))
        .select(explode(col("items")).as("src"), col("items"))
        .select(col("src"), explode(col("items")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
        .select(col("src"), col("dst"), round(lit(1.0) / col("cnt"), 6).as("w"))
      time("wedges_selfjoin")(wEdgesSelfJoin.count())
      time("wedges_posting")(wEdgesPosting.count())
      val we = wEdgesSelfJoin.localCheckpoint()
      val source = we.agg(min("src").as("node"))
      time("sssp_rounds4")(Graph.weightedShortestPaths(we, source, rounds = 4).count())
      time("sssp_converged")(Graph.weightedShortestPathsConverged(we, source).count())
      spark.stop(); return
    }

    // special mode: coreness round-count search / mode timing
    if (names.sameElements(Array("coreness_modes"))) {
      import graft.operators.Graph
      val li = Tables.t(spark, sfDir, "lineitem").filter(col("l_orderkey") % 10 === 0)
      val edges = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey").localCheckpoint()
      println(s"[optprobe] edges=${edges.count()}")
      def time(tag: String)(f: => Unit): Unit = {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[optprobe] $tag min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
      }
      // round-count search, pure default mode
      var lo = 2; var hi = 128
      while (lo < hi) {
        val mid = (lo + hi) / 2
        val ok = try {
          Graph.coreness(edges, maxIters = mid, adaptive = false).count(); true
        } catch { case _: IllegalArgumentException => false }
        if (ok) hi = mid else lo = mid + 1
        println(s"[optprobe] maxIters=$mid ok=$ok")
      }
      println(s"[optprobe] default-mode fixpoint rounds = $lo")
      time("coreness_default")(Graph.coreness(edges, adaptive = false).count())
      time("coreness_frontier")(Graph.coreness(edges, frontier = true).count())
      time("coreness_adaptive")(Graph.coreness(edges).count())
      spark.stop(); return
    }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        System.gc()
        (sec, n)
      }
      val best = times.map(_._1).min
      println(f"[optprobe] $name min=$best%.3f s rows=${times.head._2} all=${times.map(t => f"${t._1}%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
