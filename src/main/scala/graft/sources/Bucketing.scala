package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
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
 *
 * == Versioned tables behind a view (snapshot-isolated maintenance) ==
 *
 * Every logical table this module manages is a catalog VIEW over a
 * versioned physical table (`name` → `SELECT * FROM name__v{N}`), the
 * smallest possible form of the manifest layer every production table
 * format (Iceberg/Delta/Hudi) builds around immutable files:
 *
 *  - MAINTENANCE NEVER MUTATES a table readers may hold: compaction /
 *    purge / relabel-fold write `name__v{N+1}` from v{N}'s files, then
 *    flip the view — ONE ALTER VIEW call (atomic in the external
 *    catalog, which is SHARED across every session of the process;
 *    see [[flipView]] for why not CREATE OR REPLACE), so all sessions
 *    see the flip on their next resolution. The previous design's
 *    DROP→RENAME swap deleted v{N}'s files in place, and any OTHER
 *    session's cached relation (Spark's per-session tableRelationCache
 *    keys data-source relations by table name) kept listing them —
 *    FAILED_READ_FILE.FILE_NOT_EXIST on the next query, found by the
 *    stream_ingest_read_lat probe. The view indirection removes the
 *    hazard structurally: a re-resolution lands on a NEW physical name
 *    (cache miss → fresh listing), never on a stale listing.
 *  - GRACE WINDOW: v{N-1} is retained until the NEXT rewrite vacuums
 *    it (`spark.graft.bucketing.graceVersions`, default 1 — raise it
 *    when long-running readers overlap frequent compactions), so even
 *    a query planned against v{N-1} moments before a flip still finds
 *    its files. Readers therefore need no coordination with
 *    maintenance at all; only WRITERS are single — the streaming
 *    ingest loops run appends and the auto-compaction trigger from
 *    one between-batch hook, which is that contract.
 *  - CRASH-SAFE BY CONSTRUCTION: a crash after writing v{N+1} but
 *    before the flip leaves an unreferenced orphan that the next
 *    rewrite attempt clears and re-creates (operations re-run `f`
 *    from the still-current v{N} — no half-state is ever adopted, so
 *    the old tag-discrimination machinery is unnecessary). A crash
 *    between a legacy-table drop and its first view creation is
 *    recovered by [[currentPhys]]: logical name missing + versioned
 *    physicals present → re-point the view at the max version.
 *
 * Readers are untouched: `spark.table(name)` resolves the view to the
 * current physical relation, bucket spec included — bucket pruning
 * and exchange-free bucketed joins work through the view exactly as
 * against the physical table (pinned by SkewAndSinkSpec).
 */
object Bucketing {

  private def physName(table: String, v: Int) = s"${table}__v$v"

  private val ViewVer = """SELECT \* FROM \S*__v(\d+)\s*$""".r

  private def catalogOf(spark: SparkSession) = spark.sessionState.catalog

  private def tableType(spark: SparkSession, name: String)
      : Option[org.apache.spark.sql.catalyst.catalog.CatalogTableType] = {
    val cat = catalogOf(spark)
    val id = TableIdentifier(name)
    if (cat.tableExists(id)) Some(cat.getTableMetadata(id).tableType) else None
  }

  /** All catalog-registered versions of `table`, as (physName, version). */
  private def listVersions(spark: SparkSession, table: String): Seq[(String, Int)] = {
    val db = spark.catalog.currentDatabase
    catalogOf(spark).listTables(db, s"${table}__v*").flatMap { id =>
      val n = id.table
      val suffix = n.stripPrefix(s"${table}__v")
      if (suffix.nonEmpty && suffix.forall(_.isDigit)) Some((n, suffix.toInt)) else None
    }
  }

  /**
   * Resolve the CURRENT physical table behind logical `table`:
   * `Some((physName, version))`, with `version = 0` for a legacy
   * plain table occupying the logical name (created outside this
   * module, or by it before versioning). If the logical name is
   * missing but versioned physicals exist (a crash between a legacy
   * drop and the first view creation), the view is re-created over
   * the max version — the recovery path.
   */
  def currentPhys(spark: SparkSession, table: String): Option[(String, Int)] = {
    import org.apache.spark.sql.catalyst.catalog.CatalogTableType
    tableType(spark, table) match {
      case Some(CatalogTableType.VIEW) =>
        val meta = catalogOf(spark).getTableMetadata(TableIdentifier(table))
        meta.viewText.flatMap(t => ViewVer.findFirstMatchIn(t)).map { m =>
          (physName(table, m.group(1).toInt), m.group(1).toInt)
        }
      case Some(_) => Some((table, 0)) // legacy plain table
      case None =>
        val vs = listVersions(spark, table)
        if (vs.isEmpty) None
        else { // crash recovery: re-point the view at the max version
          val (phys, v) = vs.maxBy(_._2)
          spark.sql(s"CREATE VIEW $table AS SELECT * FROM $phys")
          Some((phys, v))
        }
    }
  }

  /** Bucket spec of the CURRENT physical table behind `table` (views
    * carry no spec of their own). */
  def bucketSpecOf(spark: SparkSession, table: String)
      : Option[org.apache.spark.sql.catalyst.catalog.BucketSpec] =
    currentPhys(spark, table).flatMap { case (phys, _) =>
      catalogOf(spark).getTableMetadata(TableIdentifier(phys)).bucketSpec
    }

  /** Drop a physical table if present, and its orphaned warehouse
    * directory if a previous process left one without a catalog entry. */
  private def dropPhys(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val path = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    ()
  }

  /** Drop a LOGICAL table: the view and every physical version (or the
    * plain table, for a legacy layout). The module's DROP entry point —
    * `DROP TABLE name` alone would refuse a view and strand versions. */
  def dropLogical(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.catalyst.catalog.CatalogTableType
    tableType(spark, table) match {
      case Some(CatalogTableType.VIEW) => spark.sql(s"DROP VIEW $table"); ()
      case Some(_) => spark.sql(s"DROP TABLE $table"); ()
      case None => ()
    }
    listVersions(spark, table).foreach { case (phys, _) => dropPhys(spark, phys) }
  }

  /** Point the logical view at version `v`; drops a legacy plain table
    * first (a view cannot replace a table under the same name).
    * ALTER VIEW, not CREATE OR REPLACE: replace is implemented as
    * drop+create — two catalog ops with a gap a concurrent resolver
    * can fall into (hammer-measured: 842 TABLE_OR_VIEW_NOT_FOUND in
    * 13.5k resolutions across 6.2k replace-flips, ZERO across 6.5k
    * ALTER flips — alter rewrites the entry in one synchronized
    * external-catalog call). */
  private def flipView(spark: SparkSession, table: String, v: Int): Unit = {
    import org.apache.spark.sql.catalyst.catalog.CatalogTableType
    tableType(spark, table) match {
      case Some(CatalogTableType.VIEW) =>
        spark.sql(s"ALTER VIEW $table AS SELECT * FROM ${physName(table, v)}")
      case Some(_) =>
        spark.sql(s"DROP TABLE $table")
        spark.sql(s"CREATE VIEW $table AS SELECT * FROM ${physName(table, v)}")
      case None =>
        spark.sql(s"CREATE VIEW $table AS SELECT * FROM ${physName(table, v)}")
    }
    ()
  }

  /** Drop every version outside the grace window `[current-g, current]`
    * (plus any orphan ABOVE current — a crashed rewrite's leftovers).
    * `g` = `spark.graft.bucketing.graceVersions` (default 1): how many
    * predecessors stay readable for in-flight plans. Deployments with
    * long-running readers over a frequently-compacted index raise it —
    * the storage cost is `g` extra table copies, the LSM rent. */
  private def vacuumVersions(spark: SparkSession, table: String, current: Int): Unit = {
    val grace = math.max(0,
      spark.conf.get("spark.graft.bucketing.graceVersions", "1").toInt)
    listVersions(spark, table)
      .filter { case (_, v) => v < current - grace || v > current }
      .foreach { case (phys, _) => dropPhys(spark, phys) }
  }

  /** Write df as a bucketed+sorted managed parquet table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    val next = currentPhys(spark, table).map(_._2 + 1).getOrElse(1)
    val phys = physName(table, next)
    dropPhys(spark, phys) // orphan of a crashed writer, or a stale dir
    // co-locate each bucket's rows in ONE task before the bucketed
    // write: without this every task writes a file per bucket it sees
    // (tasks × buckets small files — footer/listing overhead dominates
    // later reads); with it the table is exactly `buckets` files
    df.repartition(buckets, col(bucketCol))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(phys)
    flipView(spark, table, next)
    vacuumVersions(spark, table, next)
  }

  /**
   * Write a small (driver-boundable) frame as a single-file managed
   * parquet table — model artifacts, filter banks, codebooks. Same
   * versioned-view layout as [[writeBucketed]] (these tables get
   * OVERWRITTEN on maintenance — tombstone clears, relabel folds —
   * which is exactly the stale-listing hazard the versioning removes).
   */
  def writeSmallTable(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val next = currentPhys(spark, table).map(_._2 + 1).getOrElse(1)
    val phys = physName(table, next)
    dropPhys(spark, phys)
    df.coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(phys)
    flipView(spark, table, next)
    vacuumVersions(spark, table, next)
  }

  /**
   * Append rows to an existing bucketed table written by
   * [[writeBucketed]], preserving the bucket spec — the
   * continuous-ingest maintenance path: each batch lands as at most
   * `buckets` new files (one per bucket it touches), already hashed
   * and sorted, so bucket pruning and exchange-free joins keep
   * working over old + new rows alike. Append cost is batch-sized;
   * the standing data is never rewritten. (At very high batch
   * frequency the per-append files accumulate — the
   * [[maybeCompactBucketed]] trigger is the standard companion; the
   * contract here is that the APPEND itself never pays corpus cost.)
   * Appends go to the CURRENT version in place — an append is not a
   * rewrite; readers of the grace predecessor simply don't see the
   * newest batch yet, the same read-your-writes semantics a snapshot
   * reader of any LSM store has.
   */
  def appendBucketed(df: DataFrame, table: String, bucketCol: String): Unit = {
    val spark = df.sparkSession
    val (phys, _) = currentPhys(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table does not exist"))
    val spec = catalogOf(spark).getTableMetadata(TableIdentifier(phys)).bucketSpec
      .getOrElse(throw new IllegalArgumentException(s"$table is not bucketed"))
    require(spec.bucketColumnNames == Seq(bucketCol),
      s"$table is bucketed by ${spec.bucketColumnNames}, not $bucketCol")
    df.repartition(spec.numBuckets, col(bucketCol))
      .write.mode("append").format("parquet")
      .bucketBy(spec.numBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(phys)
  }

  /**
   * Append rows to a small managed parquet table, creating it on
   * first use — the marker/tombstone tables that ride alongside a big
   * bucketed index: each append is one small file, reads stay cheap
   * because the table is bounded by design.
   */
  def appendSmallTable(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    currentPhys(spark, table) match {
      case Some((phys, _)) =>
        df.coalesce(1).write.mode("append").format("parquet").saveAsTable(phys)
      case None =>
        val phys = physName(table, 1)
        dropPhys(spark, phys)
        df.coalesce(1).write.mode("append").format("parquet").saveAsTable(phys)
        flipView(spark, table, 1)
    }
  }

  /**
   * Rewrite a bucketed table's rows through `f`, preserving the
   * bucket spec — the shared machinery under compaction (f =
   * identity), physical tombstone purges (f = anti-join the
   * tombstones), and relabel folds. Writes `f` of the current
   * version's files into the NEXT version, flips the view, and
   * vacuums all but the grace predecessor — see the versioning
   * contract in the object doc. Reads the files as PLAIN parquet so
   * the rewrite itself is a scan of exactly the current version's
   * data files, never a stale listing.
   */
  def rewriteBucketed(spark: SparkSession, table: String,
      f: DataFrame => DataFrame): Unit = {
    val (phys, v) = currentPhys(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table does not exist"))
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(s"$table is not bucketed"))
    val next = v + 1
    val nextPhys = physName(table, next)
    dropPhys(spark, nextPhys) // orphan of a crashed rewrite
    f(spark.read.parquet(meta.location.toString))
      .repartition(spec.numBuckets, col(spec.bucketColumnNames.head))
      .write.mode("overwrite").format("parquet")
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head)
      .sortBy(spec.bucketColumnNames.head)
      .saveAsTable(nextPhys)
    flipView(spark, table, next)
    vacuumVersions(spark, table, next)
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
      .localCheckpoint() // materialize BEFORE the versioned overwrite
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
   * and clear the markers. Crash-safe and idempotent: each rewrite
   * lands as a new version behind the view; a crash mid-purge leaves
   * the markers in place (queries stay correct) and a re-run
   * completes the job.
   */
  def purgeTombstoned(spark: SparkSession, base: String, tables: Seq[String]): Unit = {
    if (!spark.catalog.tableExists(s"${base}_tombstones")) return
    val tomb = spark.table(s"${base}_tombstones").select("id").localCheckpoint()
    tables.foreach { t =>
      rewriteBucketed(spark, t, _.join(tomb, Seq("id"), "left_anti"))
    }
    dropLogical(spark, s"${base}_tombstones")
  }

  /**
   * Compact a bucketed table back to one file per bucket — the
   * periodic companion to [[appendBucketed]]: each append adds up to
   * `buckets` files, and after many batches the per-file
   * footer/listing overhead starts to tax reads. One rewrite restores
   * the one-file-per-bucket layout without touching the bucket spec
   * (so pruning and exchange-free joins are unaffected); like any
   * LSM-style maintenance job it runs out of band of queries — and
   * with the versioned-view layout it is invisible to them: readers
   * resolve the new version on their next query, in-flight plans
   * finish against the grace-retained previous version.
   */
  def compactBucketed(spark: SparkSession, table: String): Unit =
    rewriteBucketed(spark, table, identity)

  /** Data-file count under the CURRENT version's location — ONE
    * directory listing, the same listing every scan of the table pays. */
  def dataFileCount(spark: SparkSession, table: String): Long = {
    val (phys, _) = currentPhys(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table does not exist"))
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
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
    if (!spark.catalog.tableExists(table)) return false
    val buckets = bucketSpecOf(spark, table) match {
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
