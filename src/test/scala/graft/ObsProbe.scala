package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: which mid-plan observe shapes report under AQE? */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1L to 100L).toDF("x").localCheckpoint()

    // shape 1: observed node consumed TWICE downstream (fork)
    {
      val o = org.apache.spark.sql.Observation()
      val d = df.groupBy(($"x" % 10).as("g")).agg(count(lit(1)).as("c"))
        .observe(o, count(lit(1)).as("n"))
      val left = d.filter($"c" > 100).select($"g".as("gg"))
      val out = d.join(left.hint("shuffle_hash"), $"g" === $"gg", "left")
        .select($"g", $"c").localCheckpoint()
      try println(s"[obsprobe] fork: n=${o.get.get("n")} rows=${out.count()}")
      catch { case e: Exception => println(s"[obsprobe] fork FAILED: $e") }
    }

    // shape 2: observed node on a possibly-EMPTY side
    {
      val o = org.apache.spark.sql.Observation()
      val empty = df.filter($"x" > 1000).select($"x".as("y"))
        .observe(o, count(lit(1)).as("n"))
      val out = df.join(empty.hint("shuffle_hash"), $"x" === $"y", "left")
        .localCheckpoint()
      try println(s"[obsprobe] empty: n=${o.get.get("n")} rows=${out.count()}")
      catch { case e: Exception => println(s"[obsprobe] empty FAILED: $e") }
    }
    // shape 3: observe ABOVE a left join whose right side is empty
    {
      val o = org.apache.spark.sql.Observation()
      val empty = df.filter($"x" > 1000)
        .groupBy($"x".as("y")).agg(count(lit(1)).as("c2"))
      val out = df.join(empty.hint("shuffle_hash"), $"x" === $"y", "left")
        .select($"x", coalesce($"c2", lit(0L)).as("c2"))
        .observe(o, count(lit(1)).as("n"))
        .localCheckpoint()
      try println(s"[obsprobe] above-empty: n=${o.get.get("n")} rows=${out.count()}")
      catch { case e: Exception => println(s"[obsprobe] above-empty FAILED: $e") }
    }
    // shape 4: chained sub-rounds, observe each, middle join side empty
    {
      val o1 = org.apache.spark.sql.Observation()
      val o2 = org.apache.spark.sql.Observation()
      var d = df.groupBy(($"x" % 10).as("g")).agg(count(lit(1)).as("c"))
      val drop1 = d.filter($"c" < 0).select($"g".as("gg"))   // empty
      d = d.join(drop1.hint("shuffle_hash"), $"g" === $"gg", "left")
        .select($"g", $"c").observe(o1, count(lit(1)).as("n"))
      val drop2 = d.filter($"c" < 0).select($"g".as("gg"))   // empty
      d = d.join(drop2.hint("shuffle_hash"), $"g" === $"gg", "left")
        .select($"g", $"c").observe(o2, count(lit(1)).as("n"))
      val out = d.localCheckpoint()
      try println(s"[obsprobe] chain: n1=${o1.get.get("n")} " +
        s"n2=${o2.get.get("n")} rows=${out.count()}")
      catch { case e: Exception => println(s"[obsprobe] chain FAILED: $e") }
    }
    spark.stop()
  }
}
