package graft.cluster

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.{ClusterHarness, Materialize}
import graft.operators.Dedup

/**
 * FAULT INJECTION for the iterative tier: on a real multi-JVM
 * `local-cluster[2,2,2048]` with `spark.graft.reliableCheckpoints=true`
 * (checkpoint files on storage that survives executor loss —
 * [[Materialize]]), a forked executor JVM is `kill -9`ed MID-RUN of
 * the distributed connected-components loop, and the job must
 * complete with rows IDENTICAL to the undisturbed run: lost shuffle
 * files and cached blocks re-derive from the reliable checkpoint
 * files, Spark reschedules the dead executor's tasks, and the
 * standalone Master relaunches a replacement executor.
 *
 * This is the Spark-native analog of the reference's crash semantics
 * — a runId change drops pending queues and peers resend after
 * reconnect (reference: src/cluster.c:465-475,
 * tests/mr_test_module/pytests/test_network.py:482-543) — re-expressed
 * in Spark's recovery model: deterministic lineage + durable
 * checkpoints instead of message-level resend.
 */
class FaultRecoverySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var bootFailure: Option[String] = None

  private var baseline: Vector[(Long, Long)] = Vector.empty
  private var disturbed: Vector[(Long, Long)] = Vector.empty
  private var killedPid: Option[String] = None
  private var killedWhileRunning = false
  private var prePids: Set[String] = Set.empty
  private var postPids: Set[String] = Set.empty

  /** Deterministic chain-heavy graph: CC needs several star rounds. */
  private def ccPairs(s: SparkSession): DataFrame =
    // 40k-node path (one long component ⇒ multiple large/small-star
    // rounds) + pseudo-random chords every 97 nodes
    s.range(0, 39999).toDF("a_id")
      .select(col("a_id"), (col("a_id") + 1).as("b_id"))
      .union(s.range(0, 400).toDF("i")
        .select((col("i") * 97).as("a_id"),
          pmod(xxhash64(col("i")), lit(40000L)).as("b_id")))
      .filter(col("a_id") =!= col("b_id"))

  private def runCc(s: SparkSession): Vector[(Long, Long)] =
    Dedup.dupClusters(ccPairs(s), smallGraphEdges = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toVector

  /** Executor JVM fingerprints ("pid@host") from a spread-out job. */
  private def executorJvms(s: SparkSession): Set[String] =
    s.sparkContext.range(0, 64, 1, 16)
      .map(_ => java.lang.management.ManagementFactory.getRuntimeMXBean.getName)
      .collect().toSet

  override def beforeAll(): Unit = {
    val missing = Seq("SPARK_HOME", "SPARK_SCALA_VERSION").filterNot(sys.env.contains)
    if (missing.nonEmpty) {
      bootFailure = Some(s"cluster prerequisites missing from env: ${missing.mkString(", ")}")
      return
    }
    SparkTestSession.release()
    spark = ClusterHarness.configure(SparkSession.builder()
        .master(ClusterHarness.DefaultMaster)
        .appName("graft-fault-recovery")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config(Materialize.Flag, "true")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-fr-wh").toString))
      .getOrCreate()
    try {
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-fr-ckpt").toString)
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (spark.sparkContext.statusTracker.getExecutorInfos.length < 3 &&
        System.nanoTime() < deadline) Thread.sleep(200)
      if (spark.sparkContext.statusTracker.getExecutorInfos.length < 3) {
        bootFailure = Some("executor JVMs failed to launch within 120s")
        return
      }
      // 1) undisturbed run — the ground truth
      baseline = runCc(spark)
      // 2) disturbed run — a listener murders one executor JVM after
      //    the loop has made real progress (3 completed jobs ⇒ edges
      //    materialized + ≥1 star round checkpointed, loop mid-flight)
      prePids = executorJvms(spark)
      val victim = prePids.toSeq.sorted.head // "pid@host", deterministic pick
      val victimPid = victim.takeWhile(_.isDigit)
      require(victimPid.nonEmpty && prePids.size == 2,
        s"unexpected executor fingerprints: $prePids")
      val jobsDone = new AtomicInteger(0)
      val killFired = new AtomicBoolean(false)
      val running = new AtomicBoolean(false)
      // key the trigger to a job GROUP set only around the disturbed run:
      // the async listener bus can replay the probe job's onJobEnd (and
      // baseline stragglers) into a freshly added listener, which would
      // shift the "kill after 3 jobs" trigger a job early — group-scoped
      // counting makes the 3-job landmark and killedWhileRunning exact
      val disturbedGroup = "graft-fault-disturbed"
      val disturbedJobs = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val saboteur = new SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (Option(js.properties).exists(
              _.getProperty("spark.jobGroup.id") == disturbedGroup)) {
            disturbedJobs.add(js.jobId); ()
          }
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          if (disturbedJobs.contains(je.jobId) &&
              jobsDone.incrementAndGet() == 3 && killFired.compareAndSet(false, true)) {
            killedWhileRunning = running.get()
            new ProcessBuilder("kill", "-9", victimPid).start().waitFor()
            System.err.println(s"== FaultRecoverySpec: killed executor JVM $victim " +
              s"after 3 jobs (mid-run=$killedWhileRunning)")
          }
      }
      spark.sparkContext.addSparkListener(saboteur)
      try {
        spark.sparkContext.setJobGroup(disturbedGroup, "disturbed CC run",
          interruptOnCancel = false)
        running.set(true)
        disturbed = runCc(spark)
        running.set(false)
      } finally {
        spark.sparkContext.clearJobGroup()
        spark.sparkContext.removeSparkListener(saboteur)
      }
      killedPid = if (killFired.get()) Some(victim) else None
      postPids = executorJvms(spark)
    } catch {
      case e: Exception =>
        bootFailure = Some(s"cluster boot/run failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  override def afterAll(): Unit = if (spark != null) {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("an executor JVM was really killed mid-run") {
    assume(bootFailure.isEmpty, bootFailure.getOrElse(""))
    assert(killedPid.nonEmpty, "the saboteur never fired — the CC run finished " +
      "in under 3 jobs; grow the fixture so the kill lands mid-loop")
    assert(killedWhileRunning, "the kill landed outside the disturbed run window")
    assert(!postPids.contains(killedPid.get),
      s"killed JVM ${killedPid.get} still ran tasks afterwards")
    assert(postPids.nonEmpty)
    System.err.println(s"== FaultRecoverySpec: pre=$prePids post=$postPids " +
      s"(replacement launched: ${(postPids -- prePids).nonEmpty})")
  }

  test("CC completes after executor loss with rows identical to the undisturbed run") {
    assume(bootFailure.isEmpty, bootFailure.getOrElse(""))
    assert(baseline.nonEmpty, "baseline run returned no rows")
    assert(disturbed === baseline,
      s"recovered run diverged: ${disturbed.size} vs ${baseline.size} rows")
    // one long path component + chord merges: everything collapses to
    // very few clusters — sanity that the fixture exercised real work
    val nClusters = baseline.map(_._2).distinct.size
    assert(baseline.size >= 40000 && nClusters < 100,
      s"fixture shape unexpected: ${baseline.size} nodes, $nClusters clusters")
  }
}
