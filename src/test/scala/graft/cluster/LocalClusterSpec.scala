package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.ClusterHarness

/**
 * The engine run MULTI-PROCESS: `local-cluster[2,2,2048]` forks two
 * executor JVMs, so every custom serializable crosses a real process
 * boundary — codegen expressions carrying driver-built reference
 * objects (BpeSegmentExpr merge tables), Aggregator buffers
 * (MomentAgg, HIndex, BottomKDistinct), `Env[R]` envelope encoders,
 * DSv2 KeysSource partitions, and the TopKPerKey custom SparkPlan.
 * The reference's whole correctness matrix runs real 1–3-shard
 * clusters (tests/mr_test_module/pytests/common.py:155-195) because
 * cross-process (de)serialization is where engines break; this suite
 * is the Spark-native analog, and pins cluster ≡ local row equality
 * for a covering query set.
 */
class LocalClusterSpec extends AnyFunSuite with BeforeAndAfterAll {

  /** Query → the custom serializable it forces across the wire. */
  private val Cover = Seq(
    "text_bpe_table",    // BpeSegmentExpr driver-built merge-table object
    "emb_pca",           // MomentAgg O(d²) moment buffer
    "graph_coreness",    // HIndex histogram buffer + iterative observe loop
    "stream_kmv",        // BottomKDistinct bottom-k buffer
    "lmr_error_channel", // Env[R] envelope encoders
    "q_keys_source",     // DSv2 KeysSource partitions + prefix/column pushdown
    "q_keys_groupcount", // KeysSource GROUP BY slot aggregate pushdown
    "q_topk_custom",     // TopKPerKey custom SparkPlan (strategy-injected)
    "lmr_reshuffle_etl", // CRC16-slot repartition + hashtag routing
    "graph_kcore")       // localCheckpoint blocks held on remote executors

  private var clusterRows: Map[String, Vector[String]] = Map.empty
  private var executorPids: Set[String] = Set.empty

  /** Canonical row strings: columns sorted by name, rows sorted. */
  private def canon(df: DataFrame): Vector[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toVector
  }

  override def beforeAll(): Unit = {
    SparkTestSession.release()
    val s = ClusterHarness.configure(SparkSession.builder()
        .master(ClusterHarness.DefaultMaster)
        .appName("graft-local-cluster")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-lc-wh").toString))
      .getOrCreate()
    try {
      // wait for both executors, then fingerprint their JVMs
      import scala.jdk.CollectionConverters._
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (s.sparkContext.statusTracker.getExecutorInfos.length < 3 &&
        System.nanoTime() < deadline) Thread.sleep(200)
      executorPids = s.sparkContext.range(0, 64, 1, 8)
        .map(_ => java.lang.management.ManagementFactory.getRuntimeMXBean.getName)
        .collect().toSet
      clusterRows = Cover.map { name =>
        name -> canon(graft.SparkEntry.queries(name)(s, SparkTestSession.sfDir))
      }.toMap
    } finally {
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("tasks really ran in forked executor JVMs, not the driver") {
    val driverJvm = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    assert(executorPids.size === 2, s"expected 2 executor JVMs, saw $executorPids")
    assert(!executorPids.contains(driverJvm),
      s"tasks ran in the driver JVM $driverJvm — that's local[N], not a cluster")
  }

  for (name <- Cover)
    test(s"$name: local-cluster[2,2,2048] rows == local[4] rows") {
      val rows = clusterRows(name)
      assert(rows.nonEmpty, s"$name returned no rows on the cluster")
      val local = canon(graft.SparkEntry.queries(name)(
        SparkTestSession.spark, SparkTestSession.sfDir))
      assert(rows === local)
    }
}
