package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** A/B probe: plain vs banded levenshtein on the er_editdist workload. */
object EditDistProbe {
  def main(args: Array[String]): Unit = {
    val s = Graft.session(master = "local[32]")
    val dir = "/root/testdata/sf0.1"
    val part = Tables.t(s, dir, "part").select(col("p_partkey"), col("p_name"))
    val typo = part.filter(col("p_partkey") % 100 === 0)
      .select((col("p_partkey") + 1000000L).as("p_partkey"),
        concat(substring(col("p_name"), lit(1), length(col("p_name")) - 1), lit("x"))
          .as("p_name"))
    val items = part.unionAll(typo)
    val blockKey: Column => Column = c => concat(substring_index(c, " ", 1),
      substring(substring_index(c, " ", -1), 1, 1))

    def run(name: String)(dist: (Column, Column) => Column): Unit = {
      val base = items.select(col("p_partkey").as("id"), col("p_name").as("s"))
        .withColumn("blk", blockKey(col("s")))
      val t0 = System.nanoTime()
      val n = base.as("a").join(base.as("b"),
          col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
            abs(length(col("a.s")) - length(col("b.s"))) <= 2)
        .select(dist(col("a.s"), col("b.s")).cast("long").as("dist"))
        .filter(col("dist").between(0L, 2L))
        .count()
      println(f"PROBE $name%-12s pairs=$n%d secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    run("warmup")((a, b) => levenshtein(a, b))
    run("plain")((a, b) => levenshtein(a, b))
    run("banded3")((a, b) => levenshtein(a, b, 3))
    run("plain2")((a, b) => levenshtein(a, b))
    run("banded3b")((a, b) => levenshtein(a, b, 3))
    s.stop()
  }
}
