package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench drive: old (posexplode+avg) vs new (VecSum) centroid build. */
object CentroidDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    embs.count()
    def oldCent() = {
      val dims = embs.select(col("label").as("clabel"), posexplode(col("embedding")))
      dims.groupBy("clabel", "pos").agg(avg("col").as("c"))
        .groupBy("clabel")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          s => s.getField("c")).as("centroid"))
    }
    def newCent() = {
      val vsum = udaf(graft.functions.Aggregators.VecSum)
      embs.select(col("label").as("clabel"), col("embedding").cast("array<double>").as("v"))
        .groupBy("clabel")
        .agg(vsum(col("v")).as("vs"), count("*").as("n"))
        .select(col("clabel"), transform(col("vs"), x => x / col("n")).as("centroid"))
    }
    for (r <- 1 to 3) {
      var t0 = System.nanoTime(); oldCent().count(); val told = (System.nanoTime()-t0)/1e9
      t0 = System.nanoTime(); newCent().count(); val tnew = (System.nanoTime()-t0)/1e9
      println(f"rep $r: old=$told%.3f new=$tnew%.3f")
    }
    spark.stop()
  }
}
