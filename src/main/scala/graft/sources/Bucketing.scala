package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Bucketed-table discipline — the co-located-join lever at 100 TB:
 * write both sides of a recurring join bucketed (and sorted) by the
 * join key with the same bucket count, and every subsequent join on
 * that key reads pre-hashed, pre-sorted buckets instead of
 * shuffling. One write-time shuffle is amortized over every future
 * join/aggregation on the key — the difference between an ETL that
 * re-shuffles 100 TB nightly and one that never moves it again.
 *
 * The reference's analog is its fixed CRC16-slot keyspace: data is
 * born co-located by slot and reshuffle is explicit
 * (`src/cluster.c:1820-1843`); bucketing is Spark's durable form of
 * the same contract.
 */
object Bucketing {

  /** Write df as a bucketed+sorted managed parquet table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // a previous JVM's warehouse directory can outlive its (in-memory)
    // catalog entry; overwrite mode refuses such an orphaned location,
    // so clear both
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val path = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    // co-locate each bucket's rows in ONE task before the bucketed
    // write: without this every task writes a file per bucket it sees
    // (tasks × buckets small files — footer/listing overhead dominates
    // later reads); with it the table is exactly `buckets` files
    df.repartition(buckets, col(bucketCol))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
  }

  /**
   * Write a small (driver-boundable) frame as a single-file managed
   * parquet table — model artifacts, filter banks, codebooks. Clears
   * an orphaned warehouse directory like [[writeBucketed]].
   */
  def writeSmallTable(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val path = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    df.coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /**
   * Append rows to an existing bucketed table written by
   * [[writeBucketed]], preserving the bucket spec — the
   * continuous-ingest maintenance path: each batch lands as at most
   * `buckets` new files (one per bucket it touches), already hashed
   * and sorted, so bucket pruning and exchange-free joins keep
   * working over old + new rows alike. Append cost is batch-sized;
   * the standing data is never rewritten. (At very high batch
   * frequency the per-append files accumulate — a periodic compaction
   * rewrite is the standard companion; here the contract is that the
   * APPEND itself never pays corpus cost.)
   */
  def appendBucketed(df: DataFrame, table: String, bucketCol: String): Unit = {
    val spark = df.sparkSession
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(s"$table is not bucketed"))
    require(spec.bucketColumnNames == Seq(bucketCol),
      s"$table is bucketed by ${spec.bucketColumnNames}, not $bucketCol")
    df.repartition(spec.numBuckets, col(bucketCol))
      .write.mode("append").format("parquet")
      .bucketBy(spec.numBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
  }

  /**
   * Append rows to a small managed parquet table, creating it on
   * first use (clears an orphaned warehouse directory then, like
   * [[writeSmallTable]]) — the marker/tombstone tables that ride
   * alongside a big bucketed index: each append is one small file,
   * reads stay cheap because the table is bounded by design.
   */
  def appendSmallTable(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    if (!spark.sessionState.catalog.tableExists(ident)) {
      val path = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
    df.coalesce(1).write.mode("append").format("parquet").saveAsTable(table)
  }

  /**
   * Rewrite a bucketed table's rows through `f`, preserving the
   * bucket spec — the shared machinery under compaction (f =
   * identity) and physical tombstone purges (f = anti-join the
   * tombstones). Same crash-safe DROP→RENAME swap and recovery
   * contract as documented on [[compactBucketed]]; reads the files
   * as PLAIN parquet for the same one-file-per-bucket reason.
   *
   * `tag` names the OPERATION in the temp table (`{table}__rw_{tag}`)
   * so crash recovery only ever completes its OWN swap: a purge must
   * never adopt a half-finished compaction's tmp (whose rows still
   * contain the tombstoned data) as if its anti-join had run.
   */
  def rewriteBucketed(spark: SparkSession, table: String,
      f: DataFrame => DataFrame, tag: String = "compact"): Unit = {
    val tmpName = s"${table}__rw_$tag"
    val cat = spark.sessionState.catalog
    if (!cat.tableExists(org.apache.spark.sql.catalyst.TableIdentifier(table))) {
      // crash recovery: THIS operation's prior rewrite finished but
      // died between DROP and RENAME — finish the swap (f is NOT
      // re-applied; the tmp already holds this op's rewritten rows).
      // A different operation's leftover tmp is NOT adopted.
      require(cat.tableExists(org.apache.spark.sql.catalyst.TableIdentifier(tmpName)),
        s"neither $table nor $tmpName exists (a crashed rewrite of a DIFFERENT " +
          "operation must be completed by re-running that operation)")
      spark.sql(s"ALTER TABLE $tmpName RENAME TO $table")
      return
    }
    val meta = cat.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(s"$table is not bucketed"))
    writeBucketed(f(spark.read.parquet(meta.location.toString)), tmpName,
      spec.bucketColumnNames.head, spec.numBuckets)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmpName RENAME TO $table")
  }

  // ------------------------------------------------------------------
  // Tombstone discipline, shared by every persistent index
  // (MinHash, IVF-PQ): O(markers) delete, immediate query-time
  // exclusion, out-of-band physical purge. One implementation —
  // semantics fixes land once, not per index.
  // ------------------------------------------------------------------

  /** Mark ids deleted: append to `{base}_tombstones` (creates on first use). */
  def appendTombstones(ids: DataFrame, base: String): Unit =
    appendSmallTable(ids.select(col(ids.columns.head).cast("long").as("id")).distinct(),
      s"${base}_tombstones")

  /**
   * Revoke markers for re-ingested ids — called by every index
   * APPEND path: a delete means "remove what was ingested before the
   * marker", and re-appending an id re-legitimizes it (takedowns are
   * not forever). Content CHANGES still require purge-before-append:
   * clearing the marker un-hides the id's previous rows too, which
   * is only correct when the re-ingest carries the same content.
   */
  def clearTombstones(ids: DataFrame, base: String): Unit = {
    val spark = ids.sparkSession
    val table = s"${base}_tombstones"
    if (!spark.catalog.tableExists(table)) return
    val keep = spark.table(table)
      .join(ids.select(col(ids.columns.head).cast("long").as("id")).distinct(),
        Seq("id"), "left_anti")
      .localCheckpoint() // materialize BEFORE overwriting the table read above
    writeSmallTable(keep, table)
  }

  /** Tombstone-excluded view of an index table (join key: `id`). */
  def minusTombstones(df: DataFrame, base: String): DataFrame = {
    val spark = df.sparkSession
    if (spark.catalog.tableExists(s"${base}_tombstones"))
      // plain anti-join: AQE broadcasts a small tombstone set; a
      // tombstone set big enough to shuffle is overdue for a purge
      df.join(spark.table(s"${base}_tombstones"), Seq("id"), "left_anti")
    else df
  }

  /**
   * Physically drop tombstoned rows from the given bucketed tables
   * and clear the markers. Crash-safe and idempotent: the rewrites
   * use the purge-tagged swap; a crash mid-purge leaves the markers
   * in place (queries stay correct) and a re-run completes the job.
   */
  def purgeTombstoned(spark: SparkSession, base: String, tables: Seq[String]): Unit = {
    if (!spark.catalog.tableExists(s"${base}_tombstones")) return
    val tomb = spark.table(s"${base}_tombstones").select("id").localCheckpoint()
    tables.foreach { t =>
      rewriteBucketed(spark, t, _.join(tomb, Seq("id"), "left_anti"), tag = "purge")
    }
    spark.sql(s"DROP TABLE ${base}_tombstones")
  }

  /**
   * Compact a bucketed table back to one file per bucket — the
   * periodic companion to [[appendBucketed]]: each append adds up to
   * `buckets` files, and after many batches the per-file
   * footer/listing overhead starts to tax reads. One rewrite restores
   * the one-file-per-bucket layout without touching the bucket spec
   * (so pruning and exchange-free joins are unaffected); runs out of
   * band of both appends and queries, like any LSM-style maintenance
   * job. Implementation: rewrite into a sibling table, then swap by
   * catalog rename — the compacted data is fully written before the
   * old table disappears. The DROP→RENAME swap is two catalog ops,
   * not one atomic move; a crash between them leaves the data intact
   * under `{table}__compact`, and RE-RUNNING compactBucketed detects
   * that state and completes the swap.
   */
  def compactBucketed(spark: SparkSession, table: String): Unit =
    rewriteBucketed(spark, table, identity)

  /** Data-file count under a managed table's location — ONE directory
    * listing, the same listing every scan of the table pays. */
  def dataFileCount(spark: SparkSession, table: String): Long = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val path = new org.apache.hadoop.fs.Path(meta.location)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).count { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.toLong
  }

  /**
   * The AUTO-compaction policy the continuous-ingest loops run
   * between batches (the LSM analogy [[compactBucketed]] cites, made
   * self-maintaining): when the table's data-file count exceeds
   * `maxFilesPerBucket × buckets`, compact back to one file per
   * bucket. The trigger costs one directory listing per check; the
   * compaction is a corpus-sized rewrite amortized over the
   * `maxFilesPerBucket` batches that accumulated the files — the
   * same cadence contract as an LSM tree's full compaction tier.
   * Returns whether a compaction ran, so the streaming loops' specs
   * and probes can observe the trigger. `maxFilesPerBucket ≤ 0`
   * disables the policy (the manual out-of-band path).
   */
  def maybeCompactBucketed(spark: SparkSession, table: String,
      maxFilesPerBucket: Int = 8): Boolean = {
    if (maxFilesPerBucket <= 0) return false
    val cat = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    if (!cat.tableExists(ident)) return false
    val buckets = cat.getTableMetadata(ident).bucketSpec match {
      case Some(spec) => spec.numBuckets
      case None => return false
    }
    if (dataFileCount(spark, table) > buckets.toLong * maxFilesPerBucket) {
      compactBucketed(spark, table); true
    } else false
  }

  /**
   * Join two bucketed tables on their bucket keys. The merge hint
   * pins sort-merge so the plan demonstrates the point: with equal
   * bucket counts the join needs NO exchange on either side (the
   * bucketed scans already satisfy the hash distribution), regardless
   * of table size.
   */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
}
