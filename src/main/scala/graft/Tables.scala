package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet fixture access (TESTDATA.md tables). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The fixture writer may mark timestamps isAdjustedToUTC=false, which
    // Spark 4 infers as TIMESTAMP_NTZ — a type unix_millis/unix_micros
    // reject. Read them as session-TZ (UTC) instants instead: every
    // engine/oracle comparison assumes instant semantics.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /**
   * The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
   * Spark 4 rejects by default (PARQUET_TYPE_ILLEGAL). Read nanos as
   * long (legacy flag) and floor-convert to the native µs
   * TimestampType — consistent with the DuckDB oracle, which floors
   * ns to ms via epoch_ms() for every comparison we emit.
   */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
}
