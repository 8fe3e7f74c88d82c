package graft

import org.apache.spark.sql.functions._

/** Stage-level timing of text_bigram_lm at sf0.1. */
object BigramProbe {
  def main(args: Array[String]): Unit = {
    val s = Graft.session(master = "local[32]")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.t(s, dir, "documents")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm-docs") { docs.count() }
    time("full-1") {
      operators.TextAnalysis.bigramLmScore(docs).count()
    }
    time("full-2") {
      operators.TextAnalysis.bigramLmScore(docs).count()
    }
    val bg = docs.select(col("doc_id"),
      explode(transform(when(size(split(lower(col("text")), "\\s+")) >= 2,
        sequence(lit(1), size(split(lower(col("text")), "\\s+")) - 1))
        .otherwise(array().cast("array<int>")), i => i)).as("i"))
    time("explode-only") { bg.count() }
    s.stop()
  }
}
