package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Remote-task RPC semantics (MR_RunOnKey / MR_RunOnAllShards, SURVEY §2.2). */
class RemoteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("runOnAllShards gathers one result per shard (dbsize analog)") {
    val ds = spark.createDataset((1 to 100).map(_.toLong)).repartition(4)
    val r = Remote.runOnAllShards(ds)(it => it.size.toLong)
    assert(r.isRight)
    val sizes = r.toOption.get
    assert(sizes.size === 4)
    assert(sizes.sum === 100L)
  }

  test("runOnKey routes to matching records (get analog)") {
    val ds = spark.createDataset((1 to 100).map(i => (s"key:$i", i * 2L)))
    val r = Remote.runOnKey(ds, (kv: (String, Long)) => kv._1 == "key:42")(
      it => it.toSeq.headOption.map(_._2).getOrElse(-1L))
    assert(r === Right(84L))
  }

  test("runOnKey on a missing key returns the task's no-record result") {
    val ds = spark.createDataset(Seq(("a", 1L)))
    val r = Remote.runOnKey(ds, (kv: (String, Long)) => kv._1 == "zzz")(
      it => it.toSeq.headOption.map(_._2).getOrElse(-1L))
    assert(r === Right(-1L))
  }

  test("internalCommand runs every command on every shard") {
    val r = Remote.internalCommand(spark, numShards = 3)(
      Seq((shard: Int) => s"cmd1@$shard", (shard: Int) => s"cmd2@$shard"))
    assert(r.isRight)
    val replies = r.toOption.get
    assert(replies.size === 3)
    assert(replies(1) === Seq("cmd1@1", "cmd2@1"))
  }

  test("timeout yields Left, not an exception") {
    val ds = spark.createDataset(Seq(1L, 2L)).repartition(2)
    val r = Remote.runOnAllShards(ds)({ it => Thread.sleep(5000); it.size }, timeoutMs = 300)
    assert(r === Left("task timed out"))
  }
}
