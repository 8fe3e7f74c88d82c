package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** File-level zone maps: stats correctness, pruning, unknown-bounds safety. */
class ZoneMapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_zonemap_$tag").toString

  private lazy val data =
    (0L until 1000L).map(i => (i, s"v$i", i % 7)).toDF("k", "s", "m")

  test("build emits one zone row per file; counts and bounds reconcile") {
    val path = tmp("build")
    FileIO.sortedRoundTrip(data, path, "k", partitions = 8)
    val stats = ZoneMap.build(spark, path, Seq("k")).collect()
    val nFiles = spark.read.parquet(path).select(input_file_name()).distinct().count()
    assert(stats.length.toLong === nFiles)
    assert(stats.map(_.getAs[Long]("n_rows")).sum === 1000L)
    assert(stats.map(_.getAs[Long]("min_k")).min === 0L)
    assert(stats.map(_.getAs[Long]("max_k")).max === 999L)
    // range clustering ⇒ zones are disjoint: global row count equals
    // the sum of per-zone widths only if files don't overlap
    val spans = stats.map(r => (r.getAs[Long]("min_k"), r.getAs[Long]("max_k"))).sortBy(_._1)
    assert(spans.sliding(2).forall { case Array((_, hi1), (lo2, _)) => hi1 < lo2; case _ => true })
  }

  test("candidateFiles prunes non-intersecting zones; prunedRead equals a full-scan filter") {
    val path = tmp("prune")
    FileIO.sortedRoundTrip(data, path, "k", partitions = 8)
    val stats = ZoneMap.build(spark, path, Seq("k"))
    val total = stats.count()
    val cand = ZoneMap.candidateFiles(stats, "k", lit(100L), lit(160L)).count()
    assert(cand < total, s"expected pruning: $cand candidate files of $total")
    val pruned = ZoneMap.prunedRead(spark, stats, data.schema, "k", lit(100L), lit(160L))
      .select("k").collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq === (100L to 160L).toSeq)
  }

  test("empty intersection returns an empty frame with the data schema") {
    val path = tmp("empty")
    FileIO.sortedRoundTrip(data, path, "k", partitions = 4)
    val stats = ZoneMap.build(spark, path, Seq("k"))
    val out = ZoneMap.prunedRead(spark, stats, data.schema, "k", lit(5000L), lit(6000L))
    assert(out.schema === data.schema)
    assert(out.count() === 0L)
  }

  test("a file with unknown (all-null) bounds is never pruned") {
    val path = tmp("nulls")
    Seq((Some(1L), "a"), (Some(2L), "b")).toDF("k", "s")
      .coalesce(1).write.mode("overwrite").parquet(path)
    // a second file whose k column is entirely NULL
    Seq((Option.empty[Long], "hidden")).toDF("k", "s")
      .coalesce(1).write.mode("append").parquet(path)
    val stats = ZoneMap.build(spark, path, Seq("k"))
    // the all-null file must survive any range
    val cand = ZoneMap.candidateFiles(stats, "k", lit(100L), lit(200L))
    val nullFiles = stats.filter(col("min_k").isNull).count()
    assert(nullFiles >= 1L)
    assert(cand.count() >= nullFiles)
  }

  test("prunedReadBox: conjunction intersects candidates; z-order localizes both dims") {
    val path = tmp("box")
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y, x * 64 + y))
      .toDF("x", "y", "v")
    FileIO.zorderRoundTrip(grid, path, "x", "y", partitions = 16)
    val stats = ZoneMap.build(spark, path, Seq("x", "y"))
    val total = stats.count()
    val candX = ZoneMap.candidateFiles(stats, "x", lit(8L), lit(15L)).count()
    val candY = ZoneMap.candidateFiles(ZoneMap.candidateFiles(stats, "x", lit(8L), lit(15L)),
      "y", lit(8L), lit(15L)).count()
    // the second dimension must prune FURTHER on the Morton layout
    assert(candY < candX && candX < total,
      s"2-D pruning did not multiply: $total -> $candX -> $candY files")
    val out = ZoneMap.prunedReadBox(spark, stats, grid.schema,
        Seq(("x", lit(8L), lit(15L)), ("y", lit(8L), lit(15L))))
      .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for (x <- 8L to 15L; y <- 8L to 15L) yield (x, y)).toSet
    assert(out === want)
  }

  test("append unions a new batch's zones without touching standing stats") {
    val path1 = tmp("a1"); val path2 = tmp("a2")
    FileIO.sortedRoundTrip(data.filter(col("k") < 500), path1, "k", partitions = 4)
    FileIO.sortedRoundTrip(data.filter(col("k") >= 500), path2, "k", partitions = 4)
    val s1 = ZoneMap.build(spark, path1, Seq("k"))
    val all = ZoneMap.append(s1, spark, path2, Seq("k"))
    val pruned = ZoneMap.prunedRead(spark, all, data.select("k", "s", "m").schema,
      "k", lit(490L), lit(510L)).select("k").collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq === (490L to 510L).toSeq)
  }
}
