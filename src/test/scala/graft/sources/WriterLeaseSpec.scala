package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Cross-process writer lease: the guard that makes a SECOND DRIVER on
 * the same warehouse fail loudly instead of silently racing the
 * manifest layer's refcount sweep (VERDICT r14 missing #1). The
 * reference's analog is single-initiator execution ownership
 * (src/mr.c:452-464) and the drop-don't-corrupt peer discipline
 * (src/cluster.c:465-475).
 */
class WriterLeaseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def warehouse: String = spark.conf.get("spark.sql.warehouse.dir")
  private def lockFile(table: String) =
    new java.io.File(new org.apache.hadoop.fs.Path(
      warehouse, s"${table}__lock").toUri.getPath)

  test("writer ops take the lease; drop releases it and removes the lock file") {
    val t = "graft_lease_basic"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Bucketing.writeBucketed(df, t, "id", 2)
    assert(Bucketing.holdsWriterLease(t))
    assert(lockFile(t).isFile, "lock file must exist while leased")
    Bucketing.appendBucketed(Seq((3L, "c")).toDF("id", "v"), t, "id")
    assert(spark.table(t).count() === 3)
    Bucketing.dropLogical(spark, t)
    assert(!Bucketing.holdsWriterLease(t))
    assert(!lockFile(t).exists, "drop must release the lease")
  }

  test("a fresh foreign lock makes a writer THROW; breakWriterLease reclaims") {
    val t = "graft_lease_foreign"
    val f = lockFile(t)
    val now = System.currentTimeMillis()
    java.nio.file.Files.write(f.toPath,
      s"not-our-uuid|ghost@elsewhere|$now".getBytes("UTF-8"))
    try {
      val ex = intercept[java.util.ConcurrentModificationException] {
        Bucketing.writeBucketed(Seq((1L, "a")).toDF("id", "v"), t, "id", 2)
      }
      assert(ex.getMessage.contains("ghost@elsewhere"))
      assert(!spark.catalog.tableExists(t), "no mutation on a refused lease")
      // admin reclaim: break, then the write proceeds
      Bucketing.breakWriterLease(spark, t)
      Bucketing.writeBucketed(Seq((1L, "a")).toDF("id", "v"), t, "id", 2)
      assert(spark.table(t).count() === 1)
    } finally Bucketing.dropLogical(spark, t)
  }

  test("a STALE foreign lock (heartbeat older than staleMs) is broken and taken") {
    val t = "graft_lease_stale"
    val f = lockFile(t)
    java.nio.file.Files.write(f.toPath,
      s"dead-uuid|crashed@host|${System.currentTimeMillis() - 300000L}"
        .getBytes("UTF-8")) // 5 min old vs default staleMs=60s
    try {
      Bucketing.writeBucketed(Seq((1L, "a")).toDF("id", "v"), t, "id", 2)
      assert(Bucketing.holdsWriterLease(t))
      val content = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(!content.startsWith("dead-uuid"),
        "the stale lock must have been re-written by the new owner")
    } finally Bucketing.dropLogical(spark, t)
  }

  test("staleMs=0 means never expire: even an ancient foreign lock refuses") {
    val t = "graft_lease_never"
    val f = lockFile(t)
    java.nio.file.Files.write(f.toPath,
      s"dead-uuid|crashed@host|12345".getBytes("UTF-8"))
    spark.conf.set("spark.graft.writerLock.staleMs", "0")
    try {
      intercept[java.util.ConcurrentModificationException] {
        Bucketing.writeBucketed(Seq((1L, "a")).toDF("id", "v"), t, "id", 2)
      }
    } finally {
      spark.conf.unset("spark.graft.writerLock.staleMs")
      Bucketing.breakWriterLease(spark, t)
    }
  }

  test("an IDLE owner's lease stays fresh: the background heartbeat re-stamps the lock file without writer activity") {
    val t = "graft_lease_idle"
    spark.conf.set("spark.graft.writerLock.staleMs", "9000")
    try {
      Bucketing.writeBucketed(Seq((1L, "a")).toDF("id", "v"), t, "id", 2)
      def ts(): Long = new String(java.nio.file.Files.readAllBytes(
        lockFile(t).toPath), "UTF-8").split('|')(2).toLong
      val t0 = ts()
      // no writer activity at all; the daemon must refresh within
      // ~(staleMs/3 + tick) — well inside staleMs
      val deadline = System.currentTimeMillis() + 12000
      var refreshed = false
      while (!refreshed && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        refreshed = ts() > t0
      }
      assert(refreshed,
        "idle lease was never re-stamped: a live owner would lose it to a second driver")
    } finally {
      spark.conf.unset("spark.graft.writerLock.staleMs")
      Bucketing.dropLogical(spark, t)
    }
  }

  test("sweepSegments refuses to run without the writer lease") {
    val ex = intercept[IllegalStateException] {
      Bucketing.sweepSegments(spark, "graft_lease_nolease")
    }
    assert(ex.getMessage.contains("writer lease"))
  }

  test("TWO PROCESSES: a forked second driver's write fails loudly; the owner's table is intact") {
    val t = "graft_lease_mp"
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
    Bucketing.writeBucketed(df, t, "id", 4)
    assert(Bucketing.holdsWriterLease(t))
    try {
      val javaBin = new java.io.File(
        new java.io.File(System.getProperty("java.home"), "bin"), "java")
        .getAbsolutePath
      val cmd = Seq(javaBin) ++
        graft.core.ClusterHarness.AddOpens.split(" ").toSeq ++
        Seq("-Xmx1g", "-cp", System.getProperty("java.class.path"),
          "graft.sources.LeaseProbeMain", warehouse, t)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val code = p.waitFor()
      assert(code === 7,
        s"probe must exit 7 (loud refusal), got $code; output tail: " +
          out.takeRight(2000))
      // survivor unharmed: same rows, lease still ours
      assert(spark.table(t).count() === 50)
      assert(spark.table(t).filter("v = 'intruder'").count() === 0)
      assert(Bucketing.holdsWriterLease(t))
    } finally Bucketing.dropLogical(spark, t)
  }
}
