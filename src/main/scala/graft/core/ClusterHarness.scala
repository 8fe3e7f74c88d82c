package graft.core

import org.apache.spark.sql.SparkSession

/**
 * Shared wiring for running the engine MULTI-PROCESS under Spark's
 * `local-cluster[workers,coresPerWorker,memPerWorkerMB]` master — the
 * standalone-mode harness that forks every executor as its own JVM,
 * the closest local analog of the reference's 1–3-shard test clusters
 * (reference: tests/mr_test_module/pytests/common.py:155-195, which
 * boots real shard processes for the whole correctness matrix).
 * Unlike `local[N]` (one JVM, no serialization on the task path),
 * every closure, codegen-expression reference object, Aggregator
 * buffer, `Env[R]` encoder, and DSv2 partition here crosses a REAL
 * process boundary — the bug class single-JVM testing can never
 * catch.
 *
 * Forked executors start from the Spark dist's classpath only, so
 * the engine's classes (and, under sbt test, the test classpath)
 * ride in via `spark.executor.extraClassPath`; the JPMS opens mirror
 * what the driver itself runs with (build.sbt / tools/run_main.sh).
 * The driver process must export `SPARK_HOME` (the standalone Worker
 * resolves the executor launch command through it).
 */
object ClusterHarness {
  /** The JPMS opens Spark 4 needs on JDK 17+ executor JVMs. */
  val AddOpens: String = Seq(
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar")
    .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED").mkString(" ")

  /** Default two-worker topology from the round-9 validation sweep. */
  val DefaultMaster = "local-cluster[2,2,2048]"

  /** Apply executor-side classpath/JVM wiring to a session builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
    .config("spark.executor.extraJavaOptions", AddOpens)
    .config("spark.executor.memory", "1536m")
    // forked executors register over the loopback on one machine
    .config("spark.driver.host", "localhost")
}
