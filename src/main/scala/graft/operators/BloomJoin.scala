package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/**
 * Bloom-pre-filtered equi-join — the standard shuffle-reduction
 * pattern for selective fact⋈dim joins at 100 TB: build a compact
 * Bloom filter of the (already filtered) dimension keys, broadcast
 * it inside the plan as a literal, and drop non-matching fact rows
 * IN THE SCAN STAGE, before they are shuffled or even projected
 * further. The exact join afterwards removes the false positives, so
 * the result is identical to the plain join — the bloom stage is
 * pure plumbing that cuts the fact shuffle by the join selectivity
 * (modulo fpp).
 *
 * Spark's own runtime row-level filtering
 * (spark.sql.optimizer.runtime.bloomFilter.enabled) injects the same
 * shape automatically but only above size thresholds and only for
 * shuffle joins it can see through; this operator makes the pattern
 * explicit and composable (e.g. filter a STREAM by a static dim's
 * keys, or pre-filter before a custom operator).
 *
 * The membership probe is Catalyst's codegen'd
 * [[BloomFilterMightContain]] over the sketch built by
 * `df.stat.bloomFilter` (both sides are
 * org.apache.spark.util.sketch.BloomFilterImpl, so put/probe hashing
 * agree). Size the filter for the DIM side: ~1.2 bytes/key at 1%
 * fpp, so even 100M dim keys broadcast ~120 MB — still far cheaper
 * than shuffling a 100 TB fact table's non-matching rows.
 */
object BloomJoin {

  /**
   * Inner equi-join with a bloom pre-filter on the fact side.
   * `factKey`/`dimKey` must be integral (probed as long). Result ≡
   * `fact.join(dim, fact(factKey) === dim(dimKey))`.
   */
  def preFilteredJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bytes = {
      val b = new java.io.ByteArrayOutputStream()
      bf.writeTo(b)
      b.toByteArray
    }
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      ColumnBridge.expression(col(factKey).cast("long"))))
    fact.filter(mightContain).join(dim, fact(factKey) === dim(dimKey))
  }

  /**
   * Bloom "seen-before" gate for continuous ingest — the filter a
   * crawler/dedup pipeline runs before ANY expensive per-doc work:
   * the corpus's content hashes build one compact bloom (~1.2
   * bytes/doc at 1% fpp; shard by hash prefix when one filter won't
   * fit), and each incoming doc probes it in the scan stage.
   * `maybe_seen = false` is DEFINITELY new (bloom admits no false
   * negatives) and skips the exact path entirely; `maybe_seen = true`
   * routes to exact verification — at most fpp of the truly-new docs
   * pay that detour. Returns `batch` + the `maybe_seen` column.
   */
  def seenGate(batch: DataFrame, corpus: DataFrame,
      contentCol: String = "text",
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = corpus.select(xxhash64(col(contentCol)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bytes = {
      val b = new java.io.ByteArrayOutputStream()
      bf.writeTo(b)
      b.toByteArray
    }
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      ColumnBridge.expression(xxhash64(col(contentCol)))))
    batch.withColumn("maybe_seen", mightContain)
  }

  /**
   * [[seenGate]] at the scale one filter can't hold: the corpus's
   * content hashes split across `shards` filters by hash prefix, all
   * built in ONE corpus pass (per-partition per-shard filters,
   * shard-wise `mergeInPlace` — the bloom is a mergeable summary),
   * and each incoming doc probes ONLY its own shard's filter. Driver
   * memory is shards × filter bytes, but each filter sizes for 1/shards
   * of the corpus — the total is the same ~1.2 bytes/doc, now in
   * pieces that broadcast and (in a deployment) build/refresh
   * independently. Same guarantee: no false negatives.
   */
  def seenGateSharded(batch: DataFrame, corpus: DataFrame,
      contentCol: String = "text", shards: Int = 4,
      expectedItemsPerShard: Long = 250000L, fpp: Double = 0.01): DataFrame = {
    val merged = shardFilters(corpus, contentCol, shards, expectedItemsPerShard, fpp)
      .view.mapValues(serialize).toMap
    batch.withColumn("maybe_seen",
      gateColumn(merged, shards, expectedItemsPerShard, fpp, contentCol))
  }

  import org.apache.spark.util.sketch.BloomFilter

  /** One corpus pass → per-shard bloom filters (hash-prefix sharding). */
  private def shardFilters(df: DataFrame, contentCol: String, n: Int,
      expected: Long, fpp: Double): Map[Int, BloomFilter] =
    df.select(xxhash64(col(contentCol)).as("h")).rdd
      .mapPartitions { it =>
        val fs = Array.fill(n)(BloomFilter.create(expected, fpp))
        var any = false
        it.foreach { r =>
          val h = r.getLong(0)
          fs(((h % n) + n).toInt % n).putLong(h)
          any = true
        }
        if (any) fs.iterator.zipWithIndex.map { case (f, i) => (i, f) }
        else Iterator.empty
      }
      .reduceByKey { (a, b) => a.mergeInPlace(b); a }
      .collect().toMap

  private def serialize(f: BloomFilter): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream(); f.writeTo(b); b.toByteArray
  }

  /** Codegen'd probe: route each row's hash to its shard's filter. */
  private def gateColumn(filters: Map[Int, Array[Byte]], n: Int,
      expected: Long, fpp: Double,
      contentCol: String): org.apache.spark.sql.Column = {
    val emptyBytes = serialize(BloomFilter.create(expected, fpp))
    val h = xxhash64(col(contentCol))
    val shardCol = pmod(h, lit(n.toLong))
    (0 until n).foldLeft(lit(false)) { (acc, i) =>
      when(shardCol === i.toLong,
        ColumnBridge.column(BloomFilterMightContain(
          Literal(filters.getOrElse(i, emptyBytes), BinaryType),
          ColumnBridge.expression(h)))).otherwise(acc)
    }
  }

  /**
   * Persist the sharded seen-filter bank as a tiny managed table of
   * (shard, expected_items, fpp, filter bytes) — the durable form of
   * [[seenGateSharded]]'s state, so the crawler front door survives
   * restarts and is MAINTAINED incrementally ([[appendToSeenFilters]])
   * instead of rebuilt from the corpus each run. `shards` rows ×
   * ~1.2 bytes/doc of filter payload; at 100 TB the filters total the
   * same bytes they would as one filter, in pieces that refresh
   * independently.
   */
  def writeSeenFilters(corpus: DataFrame, table: String,
      contentCol: String = "text", shards: Int = 4,
      expectedItemsPerShard: Long = 250000L, fpp: Double = 0.01): Unit = {
    val spark = corpus.sparkSession
    val merged = shardFilters(corpus, contentCol, shards, expectedItemsPerShard, fpp)
    val rows = (0 until shards).map { i =>
      (i, expectedItemsPerShard, fpp,
        serialize(merged.getOrElse(i, BloomFilter.create(expectedItemsPerShard, fpp))))
    }
    import spark.implicits._
    graft.sources.Bucketing.writeSmallTable(
      rows.toDF("shard", "expected_items", "fpp", "filter"), table)
  }

  /**
   * Merge an accepted batch's content hashes into the persisted
   * filter bank — bloom filters are mergeable summaries, so the
   * update is: one BATCH pass builds per-shard filters with the
   * stored parameters (mergeInPlace-compatible by construction), OR
   * them into the stored filters, rewrite the `shards`-row table.
   * The corpus is never rescanned; cost tracks the batch.
   */
  def appendToSeenFilters(batch: DataFrame, table: String,
      contentCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    val stored = spark.table(table)
      .select("shard", "expected_items", "fpp", "filter").collect()
    require(stored.nonEmpty, s"$table is empty — writeSeenFilters first")
    val expected = stored.head.getLong(1)
    val fpp = stored.head.getDouble(2)
    val n = stored.length
    val batchFilters = shardFilters(batch, contentCol, n, expected, fpp)
    val rows = stored.map { r =>
      val i = r.getInt(0)
      val f = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](3)))
      batchFilters.get(i).foreach(f.mergeInPlace)
      (i, expected, fpp, serialize(f))
    }.toSeq
    import spark.implicits._
    graft.sources.Bucketing.writeSmallTable(
      rows.toDF("shard", "expected_items", "fpp", "filter"), table)
  }

  /** [[seenGateSharded]]'s probe side against the persisted bank. */
  def seenGateFromTable(batch: DataFrame, table: String,
      contentCol: String = "text"): DataFrame = {
    val stored = batch.sparkSession.table(table)
      .select("shard", "expected_items", "fpp", "filter").collect()
    require(stored.nonEmpty, s"$table is empty — writeSeenFilters first")
    val filters = stored.map(r => r.getInt(0) -> r.getAs[Array[Byte]](3)).toMap
    batch.withColumn("maybe_seen",
      gateColumn(filters, stored.length, stored.head.getLong(1),
        stored.head.getDouble(2), contentCol))
  }
}
