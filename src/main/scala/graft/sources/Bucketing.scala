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
 *    when long-running readers overlap frequent compactions; a TIME
 *    window `spark.graft.bucketing.vacuumRetainMs` additionally
 *    retains any version superseded less than T ms ago, the
 *    Iceberg/Delta snapshot-expiry semantics). BOTH knobs must be set
 *    on the session RUNNING THE MAINTENANCE — vacuum happens on the
 *    writer; a reader session's conf is never consulted. With them, a
 *    query planned against v{N-1} moments before a flip still finds
 *    its files. Readers therefore need no coordination with
 *    maintenance at all; only WRITERS are single — the streaming
 *    ingest loops run appends and the auto-compaction trigger from
 *    one between-batch hook, which is that contract (and the per-table
 *    writer lock + CAS flip makes a violation fail loudly instead of
 *    losing an update).
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

  // -- writer serialization -------------------------------------------------
  // One lock per logical table, held by every WRITER entry point
  // (write/append/rewrite/drop). Readers never take it — reads are
  // isolated by the versioned views, not by locking. The lock makes
  // the single-writer contract ENFORCED in-process (two threads
  // appending and compacting the same table serialize instead of
  // interleaving a rewrite's read with an append's write), and it is
  // where the CAS flip check runs: a rewrite that finds the view
  // advanced past the version it read THROWS instead of silently
  // overwriting the foreign update. Scope is this JVM — a
  // multi-driver deployment needs the metastore-level lock/commit
  // protocols production table formats use (Iceberg's atomic swap,
  // Delta's log protocol); same boundary as the rest of this module.
  private val writeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(table: String): Object =
    writeLocks.computeIfAbsent(table, _ => new Object)

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
        else { // crash recovery: re-point the view at the max version.
          // IF NOT EXISTS: two sessions racing this branch both compute
          // the same max, so whichever CREATE lands first wins and the
          // other no-ops instead of throwing TABLE_OR_VIEW_ALREADY_EXISTS
          // (the recovery read paths — bucketSpecOf, dataFileCount —
          // must stay callable concurrently).
          val (phys, v) = vs.maxBy(_._2)
          spark.sql(s"CREATE VIEW IF NOT EXISTS $table AS SELECT * FROM $phys")
          Some((phys, v))
        }
    }
  }

  /** The version the logical view currently points at, WITHOUT the
    * crash-recovery side effect of [[currentPhys]] — `None` when the
    * logical name is missing or is a legacy plain table. Introspection
    * surfaces ([[graft.Graft.info]]) use this so reporting state never
    * mutates it. */
  def peekCurrentVersion(spark: SparkSession, table: String): Option[Int] = {
    import org.apache.spark.sql.catalyst.catalog.CatalogTableType
    tableType(spark, table) match {
      case Some(CatalogTableType.VIEW) =>
        catalogOf(spark).getTableMetadata(TableIdentifier(table))
          .viewText.flatMap(t => ViewVer.findFirstMatchIn(t))
          .map(_.group(1).toInt)
      case _ => None
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
    lockFor(table).synchronized {
      cancelPending(spark, table) // a background write would re-create a version
      tableType(spark, table) match {
        case Some(CatalogTableType.VIEW) => spark.sql(s"DROP VIEW $table"); ()
        case Some(_) => spark.sql(s"DROP TABLE $table"); ()
        case None => ()
      }
      listVersions(spark, table).foreach { case (phys, _) => dropPhys(spark, phys) }
    }
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
        // ONE-TIME legacy migration (a plain table occupying the logical
        // name, written before versioning) — and the one flip that is
        // NOT concurrency-safe: DROP TABLE + CREATE VIEW is two catalog
        // ops with a resolvable gap, and dropping the managed legacy
        // table deletes its files with no grace copy, so a reader
        // holding the legacy relation can hit FAILED_READ_FILE. Run
        // migrations from a quiesced entry point (first write of a
        // deploy, not under live readers); every SUBSEQUENT flip is the
        // atomic ALTER above.
        spark.sql(s"DROP TABLE $table")
        spark.sql(s"CREATE VIEW $table AS SELECT * FROM ${physName(table, v)}")
      case None =>
        spark.sql(s"CREATE VIEW $table AS SELECT * FROM ${physName(table, v)}")
    }
    ()
  }

  /** Drop every version outside the retention window (plus any orphan
    * ABOVE current — a crashed rewrite's leftovers, dropped
    * unconditionally). A predecessor version is RETAINED when either
    * knob covers it:
    *
    *  - COUNT grace: `v >= current - g`, `g` =
    *    `spark.graft.bucketing.graceVersions` (default 1) — how many
    *    rewrites an in-flight plan may overlap;
    *  - TIME grace: the version was superseded (its successor created)
    *    less than `spark.graft.bucketing.vacuumRetainMs` ago (default
    *    0 = off) — reader exposure is measured in seconds, not
    *    rewrites, so deployments with frequent compactions under
    *    long-running readers set the time knob instead of guessing a
    *    count (the same semantics as Iceberg/Delta snapshot expiry).
    *
    * BOTH knobs are read from the session RUNNING THE MAINTENANCE —
    * setting them on a reader session has no effect (vacuum happens on
    * the writer). The storage cost is the retained table copies, the
    * LSM rent. `graceOverride` is the internal hard-removal path
    * ([[purgeTombstoned]]): `Some(0)` ignores both knobs. */
  private def vacuumVersions(spark: SparkSession, table: String, current: Int,
      graceOverride: Option[Int] = None): Unit = {
    val grace = graceOverride.getOrElse(math.max(0,
      spark.conf.get("spark.graft.bucketing.graceVersions", "1").toInt))
    val retainMs = if (graceOverride.isDefined) 0L
      else spark.conf.get("spark.graft.bucketing.vacuumRetainMs", "0").toLong
    val vs = listVersions(spark, table)
    val existing = vs.map(_._2).sorted
    val now = System.currentTimeMillis()
    // a version stopped being readable-as-current when its successor
    // was created — the catalog createTime of the next version on disk
    def supersededAt(v: Int): Long = {
      val succ = existing.find(_ > v).getOrElse(current)
      catalogOf(spark).getTableMetadata(TableIdentifier(physName(table, succ)))
        .createTime
    }
    vs.foreach { case (phys, v) =>
      if (v > current) dropPhys(spark, phys)
      else if (v < current - grace &&
          (retainMs <= 0L || now - supersededAt(v) >= retainMs))
        dropPhys(spark, phys)
    }
  }

  /** Write df as a bucketed+sorted managed parquet table (overwrite).
    * Overwrite semantics under concurrent writers are last-wins
    * (serialized by the table lock) — unlike [[rewriteBucketed]],
    * which is read-modify-write and therefore CAS-fails a lost update. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    lockFor(table).synchronized {
      cancelPending(spark, table)
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
    lockFor(table).synchronized {
      cancelPending(spark, table)
      val next = currentPhys(spark, table).map(_._2 + 1).getOrElse(1)
      val phys = physName(table, next)
      dropPhys(spark, phys)
      df.coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(phys)
      flipView(spark, table, next)
      vacuumVersions(spark, table, next)
    }
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
    lockFor(table).synchronized {
      val (phys, _) = currentPhys(spark, table).getOrElse(
        throw new IllegalArgumentException(s"$table does not exist"))
      val spec = catalogOf(spark).getTableMetadata(TableIdentifier(phys)).bucketSpec
        .getOrElse(throw new IllegalArgumentException(s"$table is not bucketed"))
      require(spec.bucketColumnNames == Seq(bucketCol),
        s"$table is bucketed by ${spec.bucketColumnNames}, not $bucketCol")
      // appends may land WHILE an out-of-band compaction is writing the
      // next version from its pinned snapshot: safe — parquet files are
      // immutable and appends only ADD files, which the finalize step
      // carries over into the new version as the delta
      df.repartition(spec.numBuckets, col(bucketCol))
        .write.mode("append").format("parquet")
        .bucketBy(spec.numBuckets, bucketCol).sortBy(bucketCol)
        .saveAsTable(phys)
    }
  }

  /**
   * Append rows to a small managed parquet table, creating it on
   * first use — the marker/tombstone tables that ride alongside a big
   * bucketed index: each append is one small file, reads stay cheap
   * because the table is bounded by design.
   */
  def appendSmallTable(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    lockFor(table).synchronized {
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
      f: DataFrame => DataFrame): Unit =
    rewriteBucketedImpl(spark, table, f, graceOverride = None)

  /** CAS semantics: the version to rewrite is read at ENTRY; if another
    * writer advanced the view before this writer acquired the table
    * lock, the rewrite throws [[java.util.ConcurrentModificationException]]
    * instead of silently rewriting (and thereby discarding) the foreign
    * update — read-modify-write must fail loudly on a lost update.
    * Single-writer deployments never see the throw. */
  private def rewriteBucketedImpl(spark: SparkSession, table: String,
      f: DataFrame => DataFrame, graceOverride: Option[Int]): Unit = {
    val v0 = currentPhys(spark, table).map(_._2).getOrElse(
      throw new IllegalArgumentException(s"$table does not exist"))
    lockFor(table).synchronized {
      cancelPending(spark, table)
      val (phys, v) = currentPhys(spark, table).getOrElse(
        throw new IllegalArgumentException(s"$table does not exist"))
      if (v != v0) throw new java.util.ConcurrentModificationException(
        s"$table advanced v$v0 -> v$v under a concurrent writer; " +
          "rewrite aborted (lost-update guard — single-writer contract violated)")
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
      vacuumVersions(spark, table, next, graceOverride)
    }
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
   *
   * PURGE REVOKES THE GRACE WINDOW for the purged tables: the rewrite
   * vacuums every predecessor version immediately (grace 0, no time
   * retention) BEFORE the markers drop, because "physically remove"
   * is the operation's whole contract — a purge whose rows survive on
   * disk until some future rewrite happens to vacuum them (which may
   * never run) is not a purge, and once the markers are gone a reader
   * resolving a retained predecessor would see deleted rows RESURFACE.
   * The cost is the one reader guarantee the grace window otherwise
   * gives: a query planned against the pre-purge version moments
   * before the flip can hit missing files and must retry. That is the
   * right trade for a takedown path; use tombstones alone (query-time
   * exclusion) when reader grace matters more than disk truth.
   */
  def purgeTombstoned(spark: SparkSession, base: String, tables: Seq[String]): Unit = {
    if (!spark.catalog.tableExists(s"${base}_tombstones")) return
    val tomb = spark.table(s"${base}_tombstones").select("id").localCheckpoint()
    tables.foreach { t =>
      rewriteBucketedImpl(spark, t, _.join(tomb, Seq("id"), "left_anti"),
        graceOverride = Some(0))
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

  // ------------------------------------------------------------------
  // Partial + out-of-band compaction — taking the corpus-sized rewrite
  // off the ingest hot path. Two composable halves:
  //
  //  - PARTIAL: only buckets whose file count exceeds the threshold
  //    are rewritten through a Spark job; every other bucket's files
  //    are carried into the next version as RAW BYTE COPIES (no
  //    decode/shuffle/re-encode — on a distributed FS this is the
  //    same file-level carry-over a manifest format gets for free by
  //    referencing unchanged files). Under skewed append patterns the
  //    rewrite cost tracks the HOT buckets, not the table.
  //  - OUT-OF-BAND: the trigger pins a snapshot of the current
  //    version's (immutable) files and hands the heavy write to a
  //    single maintenance thread; the ingest loop keeps appending to
  //    the current version meanwhile. The NEXT trigger call — still on
  //    the single-writer loop thread, between batches — finalizes:
  //    copy the delta files that appended since the snapshot into the
  //    new version, CAS-flip the view, vacuum. All catalog mutations
  //    stay on the writer thread; the background thread only reads
  //    pinned immutable files and writes a not-yet-referenced table.
  //    This is exactly an LSM tree's compaction contract: compaction
  //    runs over a frozen set of runs while new writes go to new runs,
  //    and the swap is a metadata operation.
  //
  // Crash anywhere before the flip leaves an unreferenced orphan
  // version that the standard recovery (dropPhys at the next rewrite,
  // or the v > current vacuum) clears; the in-memory pending map dying
  // with the process just means the next trigger starts fresh.
  // ------------------------------------------------------------------

  /** Bucket id encoded in a bucketed file's name — the naming scheme of
    * Spark's bucketed writer (`_NNNNN` before the extensions; see
    * Spark's own parser in sql/core/.../datasources/BucketingUtils.scala). */
  private val BucketedFileName = """.*_(\d+)(?:\..*)?$""".r
  private def bucketIdOf(name: String): Option[Int] = name match {
    case BucketedFileName(id) => scala.util.Try(id.toInt).toOption
    case _ => None
  }

  private def listDataFiles(spark: SparkSession, location: java.net.URI)
      : Seq[org.apache.hadoop.fs.Path] = {
    val path = new org.apache.hadoop.fs.Path(location)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).toSeq.collect {
      case s if s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith(".") => s.getPath
    }
  }

  /** Raw byte-copy of data files into a directory (names preserved —
    * the bucket id lives in the name). */
  private def copyInto(spark: SparkSession,
      files: Seq[org.apache.hadoop.fs.Path], destDir: java.net.URI): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dest = new org.apache.hadoop.fs.Path(destDir)
    val dfs = dest.getFileSystem(conf)
    files.foreach { f =>
      org.apache.hadoop.fs.FileUtil.copy(f.getFileSystem(conf), f, dfs,
        new org.apache.hadoop.fs.Path(dest, f.getName), false, conf)
    }
  }

  /** Write `nextPhys` as: the hot files' rows re-compacted through a
    * bucketed write + the cold files carried over as raw copies. */
  private def writePartialCompaction(spark: SparkSession, table: String,
      spec: org.apache.spark.sql.catalyst.catalog.BucketSpec,
      hot: Seq[org.apache.hadoop.fs.Path], cold: Seq[org.apache.hadoop.fs.Path],
      nextPhys: String): Unit = {
    dropPhys(spark, nextPhys) // orphan of a crashed writer
    val bcol = spec.bucketColumnNames.head
    spark.read.parquet(hot.map(_.toString): _*)
      .repartition(spec.numBuckets, col(bcol))
      .write.mode("overwrite").format("parquet")
      .bucketBy(spec.numBuckets, bcol).sortBy(bcol)
      .saveAsTable(nextPhys)
    if (cold.nonEmpty) copyInto(spark, cold,
      catalogOf(spark).getTableMetadata(TableIdentifier(nextPhys)).location)
  }

  /** Compact only the buckets whose file count exceeds
    * `maxFilesPerBucket`, carrying every other bucket's files into the
    * next version untouched (content-identical to [[compactBucketed]],
    * law-tested). Returns whether any bucket was over threshold.
    * Synchronous — the out-of-band form is [[maybeCompactBucketedAsync]]. */
  def compactBucketedPartial(spark: SparkSession, table: String,
      maxFilesPerBucket: Int = 8): Boolean = lockFor(table).synchronized {
    cancelPending(spark, table)
    val (phys, v) = currentPhys(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table does not exist"))
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(s"$table is not bucketed"))
    val files = listDataFiles(spark, meta.location)
    val (hot, cold) = splitHotCold(files, maxFilesPerBucket)
    if (hot.isEmpty) return false
    val next = v + 1
    writePartialCompaction(spark, table, spec, hot, cold, physName(table, next))
    flipView(spark, table, next)
    vacuumVersions(spark, table, next)
    true
  }

  /** Files of over-threshold buckets (plus any file whose name carries
    * no parseable bucket id — rewriting those re-homes their rows) vs
    * everything else. */
  private def splitHotCold(files: Seq[org.apache.hadoop.fs.Path],
      maxFilesPerBucket: Int)
      : (Seq[org.apache.hadoop.fs.Path], Seq[org.apache.hadoop.fs.Path]) = {
    val byBucket = files.groupBy(f => bucketIdOf(f.getName))
    val hotBuckets = byBucket.collect {
      case (Some(b), fs) if fs.size > maxFilesPerBucket => b
    }.toSet
    files.partition { f =>
      bucketIdOf(f.getName) match {
        case Some(b) => hotBuckets(b)
        case None => true
      }
    }
  }

  private final class PendingCompaction(val fromV: Int, val nextPhys: String,
      val snapshot: Set[String]) {
    @volatile var finished = false
    @volatile var failure: Throwable = null
  }
  private val pending =
    new java.util.concurrent.ConcurrentHashMap[String, PendingCompaction]()
  private lazy val maintenancePool =
    java.util.concurrent.Executors.newSingleThreadExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-maintenance"); t.setDaemon(true); t
      })

  /** Discard an in-flight background compaction (writer paths that are
    * about to change the version themselves call this under the table
    * lock): wait out the background write, then drop its unreferenced
    * output. Wasted work, never wrong state. */
  private def cancelPending(spark: SparkSession, table: String): Unit = {
    val p = pending.remove(table)
    if (p != null) {
      while (!p.finished) Thread.sleep(10)
      dropPhys(spark, p.nextPhys)
    }
  }

  /** Ops/test hook: an out-of-band compaction is in flight or awaiting
    * finalize for `table`. */
  def pendingMaintenance(table: String): Boolean = pending.containsKey(table)

  /** Test hook: block until the background WRITE (if any) completes —
    * the finalize still happens on the next trigger call. Returns
    * whether one was pending. */
  def awaitMaintenance(table: String): Boolean = {
    val p = pending.get(table)
    if (p == null) false
    else { while (!p.finished) Thread.sleep(10); true }
  }

  /**
   * The OUT-OF-BAND auto-compaction trigger for ingest hot loops — the
   * drop-in replacement for [[maybeCompactBucketed]] where a
   * corpus-sized inline rewrite would stall the micro-batch that
   * trips the threshold (measured: p99 11.5 s vs p50 2.78 s on the
   * 50-batch sustained-ingest probe; at 100 TB that inline spike is an
   * hours-long ingest stall). Per call, on the single-writer loop
   * thread:
   *
   *  1. a finished background compaction is FINALIZED (delta files
   *     appended since the snapshot are byte-copied into the new
   *     version, the view CAS-flips, old versions vacuum) — a
   *     metadata-plus-delta-sized step, never corpus-sized;
   *  2. else, if no compaction is in flight and some bucket exceeds
   *     `maxFilesPerBucket` files, a PARTIAL compaction of the
   *     over-threshold buckets is enqueued on the maintenance thread
   *     and the call returns immediately;
   *  3. else no-op.
   *
   * Returns true only when a compaction FLIPPED this call (step 1), so
   * probes and specs observe completions. A background failure is
   * rethrown here — on the writer thread, where the loop's error
   * handling lives. `maxFilesPerBucket <= 0` disables the policy.
   */
  def maybeCompactBucketedAsync(spark: SparkSession, table: String,
      maxFilesPerBucket: Int = 8): Boolean = {
    if (maxFilesPerBucket <= 0) return false
    val p = pending.get(table)
    if (p != null) {
      if (!p.finished) return false
      pending.remove(table)
      if (p.failure != null) {
        dropPhys(spark, p.nextPhys)
        throw p.failure
      }
      finalizeCompaction(spark, table, p)
      return true
    }
    if (!spark.catalog.tableExists(table)) return false
    val (phys, v) = currentPhys(spark, table).getOrElse(return false)
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    val spec = meta.bucketSpec.getOrElse(return false)
    val files = listDataFiles(spark, meta.location)
    val (hot, cold) = splitHotCold(files, maxFilesPerBucket)
    if (hot.isEmpty) return false
    val pc = new PendingCompaction(v, physName(table, v + 1),
      files.map(_.getName).toSet)
    pending.put(table, pc)
    // a fresh session for the background write: shared external catalog
    // (the flip is visible everywhere), separate per-session state (no
    // conf/cache races with the loop's micro-batch session)
    val bg = spark.newSession()
    maintenancePool.submit(new Runnable {
      def run(): Unit =
        try writePartialCompaction(bg, table, spec, hot, cold, pc.nextPhys)
        catch { case t: Throwable => pc.failure = t }
        finally pc.finished = true
    })
    false
  }

  /** Step 1 of [[maybeCompactBucketedAsync]]: carry the delta, flip,
    * vacuum — under the table lock, with the CAS lost-update guard. */
  private def finalizeCompaction(spark: SparkSession, table: String,
      p: PendingCompaction): Unit = lockFor(table).synchronized {
    val (phys, v) = currentPhys(spark, table).getOrElse(
      throw new IllegalStateException(s"$table vanished during compaction"))
    if (v != p.fromV) {
      // a foreign writer advanced the table while the compaction ran —
      // the compaction's output is stale. Drop it ONLY if the foreign
      // version didn't land on the same name (it did if the foreign
      // writer was a sync rewrite to v+1 — then our output is already
      // gone, replaced by theirs, and phys IS that table).
      if (phys != p.nextPhys) dropPhys(spark, p.nextPhys)
      throw new java.util.ConcurrentModificationException(
        s"$table advanced v${p.fromV} -> v$v during out-of-band compaction; " +
          "result discarded (single-writer contract violated)")
    }
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    val delta = listDataFiles(spark, meta.location)
      .filterNot(f => p.snapshot.contains(f.getName))
    if (delta.nonEmpty) copyInto(spark, delta,
      catalogOf(spark).getTableMetadata(TableIdentifier(p.nextPhys)).location)
    flipView(spark, table, p.fromV + 1)
    vacuumVersions(spark, table, p.fromV + 1)
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
