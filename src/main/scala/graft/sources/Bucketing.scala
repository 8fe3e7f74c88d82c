package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

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
 * == Versioned tables behind a view, with SEGMENT MANIFESTS ==
 *
 * Every logical table this module manages is a catalog VIEW over a
 * versioned table (`name` → `SELECT cols FROM name__v{N}`). For
 * bucketed tables the version is a MANIFEST, not a directory of
 * copies: data files live exactly once, in immutable SEGMENT
 * directories under `{name}__data/seg_*`, and each version
 * `name__v{N}` is an external parquet table — partitioned by a
 * synthetic `_graft_seg` column, CLUSTERED BY the bucket key — whose
 * partitions point at the segment dirs it references. That is the
 * same files-are-immutable / versions-are-file-lists contract every
 * production table format (Iceberg/Delta/Hudi) is built on, expressed
 * with nothing but the Spark catalog:
 *
 *  - A version flip never moves a byte of cold data: the next version
 *    REFERENCES unchanged segments (same physical paths) and adds the
 *    segments it rewrote. Maintenance I/O is sized by the segments it
 *    merges, never by the table — the O(corpus)-per-flip copy the
 *    previous design paid is gone.
 *  - APPENDS create a new segment (one bucketed write, ≤ buckets
 *    files) and register it as one partition of the current version —
 *    batch-sized work, one catalog call, standing data untouched.
 *  - COMPACTION merges the smallest segments geometrically (the LSM /
 *    log-structured merge policy: smallest-first, recruit the next
 *    tier only when the bytes already merged pay for it), so a row is
 *    re-merged O(log(corpus/batch)) times over the table's life, and
 *    each flip's bytes-written ≈ the merged (hot) segments only.
 *  - VACUUM drops version tables (external — a metadata operation)
 *    and then deletes segment dirs by REFERENCE COUNT: a segment is
 *    reclaimed only when no retained version's manifest lists it.
 *  - Bucket semantics ride the catalog bucket spec of the version
 *    table: bucket pruning and exchange-free bucketed joins work
 *    through view + manifest exactly as against a plain bucketed
 *    table (pinned by SkewAndSinkSpec — the merge-join plan over two
 *    manifest tables carries no Exchange).
 *
 * Flip discipline (unchanged from the pre-manifest design, hammer-
 * measured there): the view flip is ONE ALTER VIEW call — atomic in
 * the external catalog, which is shared across every session of the
 * process — so all sessions see a version boundary, never a torn one.
 *
 *  - GRACE WINDOW: superseded versions are retained by count
 *    (`spark.graft.bucketing.graceVersions`, default 1) and/or time
 *    (`spark.graft.bucketing.vacuumRetainMs`: a version whose
 *    successor FLIPPED less than T ms ago is kept — the flip instant
 *    is recorded as a table property at flip time, so out-of-band
 *    compactions that write long before they flip don't silently
 *    shorten the window). Both knobs are read on the session RUNNING
 *    THE MAINTENANCE. A retained version's manifest keeps every
 *    segment it references alive — refcount vacuum makes the grace
 *    window free for cold data (the retained "copy" is a file list).
 *  - CRASH-SAFE BY CONSTRUCTION: a crash before a flip leaves an
 *    unreferenced orphan version table (cleared by the next rewrite's
 *    vacuum of v > current) and/or an unreferenced segment dir
 *    (reclaimed by the refcount sweep). No half-state is ever adopted.
 *    A crash between a legacy-table drop and its first view creation
 *    is recovered by [[currentPhys]] (re-point the view at max
 *    version).
 *
 * Readers are untouched: `spark.table(name)` resolves the view to the
 * current version's manifest — one bucketed scan over all referenced
 * segments. Only WRITERS are single, enforced at BOTH scopes: within
 * a driver by the per-table lock + CAS flip, and ACROSS drivers by a
 * per-table writer LEASE file in the warehouse (atomic create,
 * owner + heartbeat in content) — a second driver's writer op, or a
 * segment sweep by a non-owner, fails loudly instead of silently
 * losing data. Full multi-driver CONCURRENT writes (optimistic commit
 * with retry, Iceberg's swap / Delta's log) remain out of scope; the
 * lease turns that boundary from a silent data-loss hole into a
 * thrown exception.
 */
object Bucketing {

  private def physName(table: String, v: Int) = s"${table}__v$v"

  /** Synthetic partition column carrying the segment name — never
    * visible through the logical view (the view projects data columns
    * only). */
  private val SegCol = "_graft_seg"

  /** Matches both view shapes: `SELECT * FROM t__vN` (small tables)
    * and `SELECT `a`,`b` FROM t__vN` (manifest tables). */
  private val ViewVer = """FROM \S*__v(\d+)\s*$""".r

  private def catalogOf(spark: SparkSession) = spark.sessionState.catalog

  private def warehouse(spark: SparkSession): String =
    spark.conf.get("spark.sql.warehouse.dir")

  private def hadoopFs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataDir(spark: SparkSession, table: String) =
    new org.apache.hadoop.fs.Path(warehouse(spark), s"${table}__data")

  // -- writer serialization -------------------------------------------------
  // One lock per logical table, held by every WRITER entry point
  // (write/append/rewrite/drop/compaction-trigger/finalize). Readers
  // never take it — reads are isolated by the versioned views. The
  // lock makes the single-writer contract ENFORCED in-process, and it
  // is where the CAS flip check runs: a rewrite that finds the view
  // advanced past the version it read THROWS instead of silently
  // overwriting the foreign update.
  private val writeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(table: String): Object =
    writeLocks.computeIfAbsent(table, _ => new Object)

  // -- cross-process writer LEASE -------------------------------------
  // The in-JVM lock above cannot see a SECOND DRIVER pointed at the
  // same warehouse — whose refcount sweep could delete a segment this
  // process is still writing: silent data loss. The lease makes that
  // fail LOUDLY, matching the reference's single-initiator ownership
  // (an execution is owned by the shard that created it,
  // src/mr.c:452-464) and its drop-don't-corrupt peer discipline
  // (src/cluster.c:465-475).
  //
  // Protocol: the first writer operation on a table atomically creates
  // `{warehouse}/{table}__lock` (create with overwrite=false — atomic
  // on HDFS and conditional-put object stores; best-effort on a raw
  // local FS) carrying `leaseUuid|pid@host|heartbeatMs`. The lease is
  // held for the JVM's lifetime, heartbeat-refreshed by writer
  // activity at most every staleMs/3, released by [[dropLogical]] and
  // a JVM shutdown hook. A second process's writer op finds a foreign
  // owner with a fresh heartbeat and THROWS
  // [[java.util.ConcurrentModificationException]]. A CRASHED owner
  // stops heartbeating: after `spark.graft.writerLock.staleMs`
  // (default 60000; 0 = never expire — admin must
  // [[breakWriterLease]]) the lease is takeable. [[sweepSegments]] —
  // the one operation that deletes shared files — refuses to run
  // unless this JVM holds the lease.
  private val leaseUuid = java.util.UUID.randomUUID().toString
  private final class LeaseState(val path: String,
      val hadoopConf: org.apache.hadoop.conf.Configuration,
      val staleMs: Long) {
    @volatile var lastBeat: Long = System.currentTimeMillis()
  }
  private val heldLeases =
    new java.util.concurrent.ConcurrentHashMap[String, LeaseState]()
  private val leaseHookArmed = new java.util.concurrent.atomic.AtomicBoolean(false)

  // A held lease must stay fresh while the OWNER IS ALIVE, not merely
  // while it is writing — an ingest loop with a batch cadence longer
  // than staleMs would otherwise have its lease expire mid-lifetime
  // and a second driver could take it, re-opening exactly the race
  // the lease closes. A single daemon thread re-stamps every held
  // lease file when it approaches staleMs/3 of age; writer activity
  // also refreshes opportunistically (covers the thread dying).
  private lazy val leaseHeartbeat = {
    val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-lease-heartbeat"); t.setDaemon(true); t
      })
    ex.scheduleWithFixedDelay(() => {
      import scala.jdk.CollectionConverters._
      heldLeases.asScala.foreach { case (_, st) =>
        val now = System.currentTimeMillis()
        if (st.staleMs > 0 && now - st.lastBeat > st.staleMs / 3) {
          try {
            val p = new org.apache.hadoop.fs.Path(st.path)
            writeLockFile(p.getFileSystem(st.hadoopConf), p, overwrite = true)
            st.lastBeat = now
          } catch { case _: Throwable => () } // retried next tick
        }
      }
    }, 5, 5, java.util.concurrent.TimeUnit.SECONDS)
    ex
  }

  private def lockPath(spark: SparkSession, table: String) =
    new org.apache.hadoop.fs.Path(warehouse(spark), s"${table}__lock")

  private def leaseStaleMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.writerLock.staleMs", "60000").toLong

  private def writeLockFile(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path, overwrite: Boolean): Unit = {
    val who = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    val out = fs.create(path, overwrite)
    try out.write(s"$leaseUuid|$who|${System.currentTimeMillis()}".getBytes("UTF-8"))
    finally out.close()
  }

  /** Acquire (or heartbeat) this JVM's writer lease on `table`. Every
    * writer entry point calls this; re-entry is free (one map read). */
  private def ensureWriterLease(spark: SparkSession, table: String): Unit = {
    val now = System.currentTimeMillis()
    val stale = leaseStaleMs(spark)
    val held = heldLeases.get(table)
    if (held != null) {
      if (stale > 0 && now - held.lastBeat > stale / 3) {
        val p = new org.apache.hadoop.fs.Path(held.path)
        writeLockFile(hadoopFs(spark, p), p, overwrite = true)
        held.lastBeat = now
      }
      return
    }
    val path = lockPath(spark, table)
    val fs = hadoopFs(spark, path)
    var attempts = 0
    while (!heldLeases.containsKey(table)) {
      attempts += 1
      try {
        writeLockFile(fs, path, overwrite = false)
        heldLeases.put(table, new LeaseState(path.toString,
          spark.sparkContext.hadoopConfiguration, stale))
        leaseHeartbeat // arm the background refresher
        if (leaseHookArmed.compareAndSet(false, true))
          Runtime.getRuntime.addShutdownHook(new Thread(() =>
            releaseAllLeases(spark), "graft-lease-release"))
      } catch {
        case _: java.io.IOException => // exists (or FS hiccup): adjudicate
          val content =
            try {
              val in = fs.open(path)
              try new String(in.readAllBytes(), "UTF-8")
              finally in.close()
            } catch { case _: java.io.IOException => null }
          content match {
            case null => // vanished between create and read — retry
              if (attempts > 3) throw new java.io.IOException(
                s"cannot adjudicate writer lock ${path} for $table")
            case c =>
              val parts = c.split('|')
              val owner = parts.headOption.getOrElse("")
              val ts = parts.lift(2).flatMap(s =>
                scala.util.Try(s.toLong).toOption).getOrElse(0L)
              if (owner == leaseUuid) // our own file (re-adopt)
                heldLeases.put(table, new LeaseState(path.toString,
                  spark.sparkContext.hadoopConfiguration, stale))
              else if (stale > 0 && now - ts > stale) {
                fs.delete(path, false) // expired: break and retry create
                if (attempts > 5) throw new java.io.IOException(
                  s"writer lock $path for $table keeps reappearing")
              } else throw new java.util.ConcurrentModificationException(
                s"$table is write-leased by ${parts.lift(1).getOrElse("?")} " +
                  s"(lease $owner, heartbeat ${now - ts} ms ago): a second " +
                  "driver writing the same warehouse violates the " +
                  "single-writer contract — stop the owner, wait out " +
                  "spark.graft.writerLock.staleMs, or call " +
                  "Bucketing.breakWriterLease")
          }
      }
    }
  }

  /** Ops/spec hook: does THIS JVM hold the writer lease on `table`? */
  def holdsWriterLease(table: String): Boolean = heldLeases.containsKey(table)

  /** Ops view of writer leases: one `(table, description)` per lock
    * file in the warehouse — who holds it (this JVM or a foreign
    * owner's pid@host) and how fresh its heartbeat is. One directory
    * listing; an unreadable lock degrades its own row, never the
    * report ([[graft.Graft.info]]'s `lease` section). */
  def leaseInfo(spark: SparkSession): Seq[(String, String)] = {
    val wh = new org.apache.hadoop.fs.Path(warehouse(spark))
    val fs = hadoopFs(spark, wh)
    if (!fs.exists(wh)) return Nil
    val now = System.currentTimeMillis()
    fs.listStatus(wh).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith("__lock"))
      .sortBy(_.getPath.getName)
      .map { s =>
        val table = s.getPath.getName.stripSuffix("__lock")
        val desc = try {
          val in = fs.open(s.getPath)
          val c = try new String(in.readAllBytes(), "UTF-8") finally in.close()
          val parts = c.split('|')
          val owner = parts.headOption.getOrElse("")
          val who = parts.lift(1).getOrElse("?")
          val age = parts.lift(2).flatMap(x =>
            scala.util.Try(x.toLong).toOption).map(now - _)
          (if (owner == leaseUuid) "held by this driver"
           else s"held by $who") +
            age.map(a => s", heartbeat ${a} ms ago").getOrElse("")
        } catch { case _: Exception => "unreadable" }
        (table, desc)
      }
  }

  /** Release this JVM's lease on `table` (deletes the lock file). */
  def releaseWriterLease(spark: SparkSession, table: String): Unit = {
    val st = heldLeases.remove(table)
    if (st != null) {
      val p = new org.apache.hadoop.fs.Path(st.path)
      try { hadoopFs(spark, p).delete(p, false); () }
      catch { case _: java.io.IOException => () }
    }
  }

  /** ADMIN op: forcibly remove `table`'s writer lock file regardless of
    * owner — for reclaiming a table whose leasing driver crashed with
    * `staleMs=0` (never-expire). Running it while the owner is alive
    * re-opens exactly the data race the lease exists to prevent. */
  def breakWriterLease(spark: SparkSession, table: String): Unit = {
    heldLeases.remove(table)
    val p = lockPath(spark, table)
    try { hadoopFs(spark, p).delete(p, false); () }
    catch { case _: java.io.IOException => () }
  }

  private def releaseAllLeases(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    heldLeases.keySet().asScala.toSeq.foreach { t =>
      try releaseWriterLease(spark, t)
      catch { case _: Throwable => () } // best effort at shutdown
    }
  }

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
          spark.sql(s"CREATE VIEW IF NOT EXISTS $table AS ${viewSelect(spark, phys)}")
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

  /** Whether a version table is manifest-layout (partitioned by the
    * segment column) as opposed to a plain managed table (small tables,
    * legacy layout). */
  private def isManifest(meta: org.apache.spark.sql.catalyst.catalog.CatalogTable) =
    meta.partitionColumnNames == Seq(SegCol)

  /**
   * One segment reference in a manifest: name, physical dir, and the
   * immutable metadata recorded at registration time —
   * `graft.bytes` (the segment's data size, so maintenance triggers
   * never re-list the FS for what the writer already knew) and
   * optional `graft.min.{col}` / `graft.max.{col}` zone stats (the
   * manifest-level skipping Iceberg/Delta carry per data file).
   */
  final case class SegRef(name: String, location: String,
      params: Map[String, String])

  /** The segment manifest of a version. For a non-manifest table, one
    * pseudo-entry for its own location. Catalog-only — no FS listing. */
  private def segmentsOf(spark: SparkSession, phys: String): Seq[SegRef] = {
    val cat = catalogOf(spark)
    val meta = cat.getTableMetadata(TableIdentifier(phys))
    if (isManifest(meta))
      cat.listPartitions(TableIdentifier(phys)).map { p =>
        SegRef(p.spec(SegCol), p.location.toString, p.parameters)
      }
    else Seq(SegRef(phys, meta.location.toString, Map.empty))
  }

  /** The manifest partition column, for plan-level consumers (the
    * automatic prune rule matches relations partitioned by it). */
  private[graft] def segColName: String = SegCol

  /** The zone-stats columns a table tracks per segment (the
    * `graft.statsCols` property riding every version table). */
  private[graft] def statsColsOf(
      meta: org.apache.spark.sql.catalyst.catalog.CatalogTable): Seq[String] =
    meta.properties.get("graft.statsCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

  /** Number of segments in the CURRENT version's manifest — the cheap
    * (catalog-only, no FS listing) health metric the auto-compaction
    * trigger reads; each segment contributes at most one file per
    * bucket, so `files-per-bucket ≤ segmentCount`. */
  def segmentCount(spark: SparkSession, table: String): Int =
    currentPhys(spark, table) match {
      case Some((phys, _)) => segmentsOf(spark, phys).size
      case None => 0
    }

  /** Whether the CURRENT version behind `table` is manifest-layout —
    * i.e. [[segmentCount]] is the right (catalog-only) trigger metric;
    * legacy in-place layouts need the FS file count. */
  def isManifestTable(spark: SparkSession, table: String): Boolean =
    currentPhys(spark, table).exists { case (phys, _) =>
      isManifest(catalogOf(spark).getTableMetadata(TableIdentifier(phys)))
    }

  /** Segment refs of the CURRENT version — names, locations, and the
    * registration metadata (bytes + zone stats). Catalog-only. */
  def currentSegments(spark: SparkSession, table: String): Seq[SegRef] =
    currentPhys(spark, table) match {
      case Some((phys, _)) => segmentsOf(spark, phys)
      case None => Nil
    }

  /**
   * The CURRENT segments a range `[lower, upper]` on `statsCol` can
   * possibly intersect, judged by the manifest's per-segment zone
   * stats — the segment-level analog of parquet row-group skipping,
   * and what Iceberg/Delta manifests buy: an ingest-keyed query over
   * a long-lived table (appends are naturally time-clustered) touches
   * only the segments whose [min,max] overlaps the range, not the
   * whole history. Bounds are inclusive and serialized as strings
   * ([[segmentRegParams]]' encoding): numeric columns compare as
   * decimals, everything else lexicographically. A segment with no
   * recorded stats for the column is KEPT (pruning must be a
   * superset), so the result is always safe to scan + re-filter.
   */
  def prunedSegments(spark: SparkSession, table: String, statsCol: String,
      lower: Option[String], upper: Option[String]): Seq[SegRef] = {
    val (phys, _) = currentPhys(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table does not exist"))
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    segmentsOf(spark, phys).filter(
      segIntersects(meta, _, statsCol, lower, upper))
  }

  /** Whether a segment's recorded zone stats can intersect an
    * inclusive `[lower, upper]` range on `statsCol` — missing stats ⇒
    * true (pruning must stay a superset), and so do UNPARSEABLE
    * stats (a float column whose min/max serialized as NaN/Infinity
    * breaks the decimal compare — keep the segment, never drop on a
    * parse edge). The shared core of [[prunedSegments]] and the
    * automatic Catalyst rule ([[graft.plans.SegmentPruneRule]]). */
  private def segIntersects(
      meta: org.apache.spark.sql.catalyst.catalog.CatalogTable, r: SegRef,
      statsCol: String, lower: Option[String], upper: Option[String]): Boolean = {
    val numeric = meta.schema.find(_.name == statsCol)
      .exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    def cmp(a: String, b: String): Int =
      if (numeric) new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
      else a.compareTo(b)
    val lo = r.params.get(s"graft.min.$statsCol")
    val hi = r.params.get(s"graft.max.$statsCol")
    scala.util.Try {
      upper.forall(u => lo.forall(l => cmp(l, u) <= 0)) &&
        lower.forall(w => hi.forall(h => cmp(h, w) >= 0))
    }.getOrElse(true)
  }

  /** Segment names of version table `phys` surviving EVERY bound in
    * `bounds` (`(statsCol, lower, upper)`, inclusive, string-encoded
    * as [[segmentRegParams]] serializes), plus the manifest's total
    * segment count. Catalog-only. The hook the automatic
    * plan-rewrite rule ([[graft.plans.SegmentPruneRule]]) calls with
    * bounds extracted from a query's filter condition. */
  private[graft] def pruneSegNamesForPhys(spark: SparkSession, phys: String,
      bounds: Seq[(String, Option[String], Option[String])]): (Set[String], Int) = {
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    val segs = segmentsOf(spark, phys)
    val kept = segs.filter(r => bounds.forall { case (c, lo, hi) =>
      segIntersects(meta, r, c, lo, hi)
    })
    (kept.map(_.name).toSet, segs.size)
  }

  /**
   * Scan of `table` restricted to the segments a `[lower, upper]`
   * range on `statsCol` can intersect ([[prunedSegments]]) — same
   * schema as `spark.table(table)`, a SUPERSET of the rows matching
   * the range (callers still apply the predicate; parquet min/max
   * then skips row groups within the surviving segments). Falls back
   * to the plain view scan for non-manifest tables.
   */
  def readSegmentsPruned(spark: SparkSession, table: String, statsCol: String,
      lower: Option[String], upper: Option[String]): DataFrame = {
    val (phys, _) = currentPhys(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table does not exist"))
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    if (!isManifest(meta)) return spark.table(table)
    val cols = meta.schema.fieldNames.filterNot(_ == SegCol).map(col).toSeq
    // empty segments carry no readable files (and no rows): skip them
    val kept = prunedSegments(spark, table, statsCol, lower, upper)
      .filterNot(_.params.get("graft.bytes").contains("0"))
    if (kept.isEmpty) spark.table(table).limit(0)
    else spark.read.parquet(kept.map(_.location): _*).select(cols: _*)
  }

  // ------------------------------------------------------------------
  // Time travel — the grace knobs (`graceVersions`, `vacuumRetainMs`)
  // don't just shield in-flight readers from the vacuum; every version
  // they retain is QUERYABLE HISTORY. With manifests a retained
  // version costs metadata plus only the segments unique to it (cold
  // segments are shared by reference), so "keep a day of versions" is
  // affordable at any table size — the Iceberg/Delta snapshot-read
  // discipline on plain Spark catalog tables.
  // ------------------------------------------------------------------

  /** Retained versions of `table`, ascending, with each version's flip
    * instant (epoch ms; `None` for a version that never flipped — a
    * legacy layout or a crashed writer's orphan). Catalog-only. */
  def versionHistory(spark: SparkSession, table: String): Seq[(Int, Option[Long])] =
    listVersions(spark, table).sortBy(_._2).map { case (phys, v) =>
      val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
      (v, meta.properties.get("graft.flippedAt").flatMap(s =>
        scala.util.Try(s.toLong).toOption))
    }

  /** Read `table` AS OF version `version` — same schema and layout
    * guarantees as `spark.table(table)` (bucketed scans, segment
    * pruning, the lot). A version is a REWRITE-lineage snapshot: it
    * accretes appends while current (an append registers one segment
    * into the current manifest, no flip) and freezes once superseded —
    * for an exact instant across appends use [[readAsOf]], which
    * resolves at segment granularity. Throws with the retained range
    * when the version fell outside the grace window: history depth is
    * the `graceVersions`/`vacuumRetainMs` retention policy, not a
    * separate log. */
  def readVersion(spark: SparkSession, table: String, version: Int): DataFrame = {
    val phys = physName(table, version)
    if (!catalogOf(spark).tableExists(TableIdentifier(phys))) {
      val have = versionHistory(spark, table).map(_._1)
      throw new IllegalArgumentException(
        s"$table has no retained version $version (retained: " +
          s"${if (have.isEmpty) "none" else have.mkString(",")}); widen " +
          "spark.graft.bucketing.graceVersions / vacuumRetainMs to keep more history")
    }
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    val df = spark.table(phys)
    if (isManifest(meta))
      df.select(meta.schema.fieldNames.filterNot(_ == SegCol).map(col).toSeq: _*)
    else df
  }

  /** Read `table` AS OF a wall-clock instant — what a query STARTING
    * at `tsMillis` saw: the newest retained version flipped by then,
    * restricted to the segments registered by then (each segment's
    * `graft.appendedAt` rides its manifest entry, carried by
    * reference through rewrites — so the instant resolves at APPEND
    * granularity, not just rewrite granularity). A segment without
    * the stamp (registered before this feature) is kept. Plain
    * (small-table) versions resolve at version granularity. Throws
    * when the instant predates all retained history. */
  def readAsOf(spark: SparkSession, table: String, tsMillis: Long): DataFrame = {
    val current = currentPhys(spark, table).map(_._2)
      .getOrElse(throw new IllegalArgumentException(s"$table does not exist"))
    val eligible = versionHistory(spark, table)
      .filter { case (v, at) => v <= current && at.exists(_ <= tsMillis) }
    if (eligible.isEmpty) throw new IllegalArgumentException(
      s"$table retains no version flipped at or before $tsMillis; widen " +
        "spark.graft.bucketing.graceVersions / vacuumRetainMs to keep more history")
    val v = eligible.map(_._1).max
    val phys = physName(table, v)
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    if (!isManifest(meta)) return readVersion(spark, table, v)
    val kept = segmentsOf(spark, phys).filter(
      _.params.get("graft.appendedAt").forall(s =>
        scala.util.Try(s.toLong).toOption.forall(_ <= tsMillis)))
      .filterNot(_.params.get("graft.bytes").contains("0"))
    val cols = meta.schema.fieldNames.filterNot(_ == SegCol).map(col).toSeq
    if (kept.isEmpty) readVersion(spark, table, v).limit(0)
    else spark.read.parquet(kept.map(_.location): _*).select(cols: _*)
  }

  // ------------------------------------------------------------------
  // Append feed — pull-based CDC over a manifest table. Each INGEST
  // segment (a write/append batch) is immutable and stamped with its
  // registration instant, so a downstream consumer gets exactly-once
  // delivery of every ingested row by polling `segmentFeed` with its
  // last watermark and reading the returned segments. MAINTENANCE
  // segments (compaction merges, fold/purge rewrites) re-package rows
  // already delivered and are excluded by their `graft.origin` stamp.
  // The feed window is the retention window: segments merged away
  // stay visible through the retained predecessor versions, so set
  // `graceVersions`/`vacuumRetainMs` to cover the slowest consumer's
  // polling interval — the same knob that bounds time travel. (Note
  // the feed is an APPEND feed: rewrites that change rows in place —
  // tombstone purge, relabel folds — are not re-delivered.)
  // ------------------------------------------------------------------

  /** The ingest segments of `table` registered strictly after
    * `sinceMs`, oldest-first, unioned across ALL retained versions
    * (deduped by name — a segment merged away in the current version
    * is still fed from its retained predecessor), plus the new
    * watermark (max registration instant seen, or `sinceMs` when the
    * feed is empty). Catalog-only. Read the refs with
    * [[readSegments]]. */
  def segmentFeed(spark: SparkSession, table: String, sinceMs: Long)
      : (Seq[SegRef], Long) = {
    val segs = listVersions(spark, table)
      .flatMap { case (phys, _) => segmentsOf(spark, phys) }
      .groupBy(_.name).map(_._2.head).toSeq
    val fresh = segs.flatMap { r =>
      val at = r.params.get("graft.appendedAt").flatMap(s =>
        scala.util.Try(s.toLong).toOption)
      val ingest = r.params.get("graft.origin").forall(_ == "ingest")
      at match {
        case Some(ts) if ingest && ts > sinceMs => Some((ts, r))
        case _ => None
      }
    }.sortBy { case (ts, r) => (ts, r.name) }
    val wm = (sinceMs +: fresh.map(_._1)).max
    (fresh.map(_._2), wm)
  }

  /** Read specific fed segments of `table` — same schema as
    * `spark.table(table)`. A consumer lagging past the retention
    * window fails loudly here (missing files), never silently skips. */
  def readSegments(spark: SparkSession, table: String,
      segs: Seq[SegRef]): DataFrame = {
    val (phys, _) = currentPhys(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table does not exist"))
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    val cols = meta.schema.fieldNames.filterNot(_ == SegCol).map(col).toSeq
    val kept = segs.filterNot(_.params.get("graft.bytes").contains("0"))
    if (kept.isEmpty) spark.table(table).limit(0)
    else spark.read.parquet(kept.map(_.location): _*).select(cols: _*)
  }

  /** The data directories of the CURRENT version (segment dirs for a
    * manifest table; the table location otherwise) — what a rewrite
    * reads as plain parquet so it scans exactly the current files. */
  private def currentDataDirs(spark: SparkSession, table: String): Seq[String] = {
    val (phys, _) = currentPhys(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table does not exist"))
    segmentsOf(spark, phys).map(_.location)
  }

  /** Drop a physical version table if present. Manifest tables are
    * external — the DROP is metadata-only and never touches segment
    * files (those are reclaimed by [[sweepSegments]] refcounting); the
    * (empty) version root dir is removed. Plain tables (small-table
    * versions) delete their own directory, plus any orphaned warehouse
    * directory a previous process left without a catalog entry. */
  private def dropPhys(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val path = new org.apache.hadoop.fs.Path(warehouse(spark), name)
    val fs = hadoopFs(spark, path)
    if (fs.exists(path)) fs.delete(path, true)
    ()
  }

  /** Drop a LOGICAL table: the view, every physical version, and the
    * segment data dir. The module's DROP entry point — `DROP TABLE
    * name` alone would refuse a view and strand versions. */
  def dropLogical(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.catalyst.catalog.CatalogTableType
    lockFor(table).synchronized {
      ensureWriterLease(spark, table)
      cancelPending(spark, table) // a background write would re-create a segment
      tableType(spark, table) match {
        case Some(CatalogTableType.VIEW) => spark.sql(s"DROP VIEW $table"); ()
        case Some(_) => spark.sql(s"DROP TABLE $table"); ()
        case None => ()
      }
      listVersions(spark, table).foreach { case (phys, _) => dropPhys(spark, phys) }
      val dd = dataDir(spark, table)
      val fs = hadoopFs(spark, dd)
      if (fs.exists(dd)) fs.delete(dd, true)
      releaseWriterLease(spark, table) // the table is gone; free the name
    }
  }

  /** The view body for a version table: manifest tables project the
    * data columns (hiding the segment partition column); plain tables
    * keep `SELECT *`. */
  private def viewSelect(spark: SparkSession, phys: String): String = {
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    if (isManifest(meta)) {
      val cols = meta.schema.fieldNames.filterNot(_ == SegCol)
        .map(c => s"`$c`").mkString(", ")
      s"SELECT $cols FROM $phys"
    } else s"SELECT * FROM $phys"
  }

  /** Point the logical view at version `v`; drops a legacy plain table
    * first (a view cannot replace a table under the same name).
    * ALTER VIEW, not CREATE OR REPLACE: replace is implemented as
    * drop+create — two catalog ops with a gap a concurrent resolver
    * can fall into (hammer-measured: 842 TABLE_OR_VIEW_NOT_FOUND in
    * 13.5k resolutions across 6.2k replace-flips, ZERO across 6.5k
    * ALTER flips — alter rewrites the entry in one synchronized
    * external-catalog call). The flip instant is recorded on the new
    * version (`graft.flippedAt`) — the supersession timestamp the
    * time-retention vacuum reads, so a version written long before it
    * flips (out-of-band compaction) doesn't shorten its predecessor's
    * retention window. */
  private def flipView(spark: SparkSession, table: String, v: Int): Unit = {
    import org.apache.spark.sql.catalyst.catalog.CatalogTableType
    val body = viewSelect(spark, physName(table, v))
    tableType(spark, table) match {
      case Some(CatalogTableType.VIEW) =>
        spark.sql(s"ALTER VIEW $table AS $body")
      case Some(_) =>
        // ONE-TIME legacy migration (a plain table occupying the logical
        // name, written before versioning) — and the one flip that is
        // NOT concurrency-safe: DROP TABLE + CREATE VIEW is two catalog
        // ops with a resolvable gap, and dropping the managed legacy
        // table deletes its files with no grace copy. Run migrations
        // from a quiesced entry point (first write of a deploy, not
        // under live readers); every SUBSEQUENT flip is the atomic
        // ALTER above.
        spark.sql(s"DROP TABLE $table")
        spark.sql(s"CREATE VIEW $table AS $body")
      case None =>
        spark.sql(s"CREATE VIEW $table AS $body")
    }
    spark.sql(s"ALTER TABLE ${physName(table, v)} SET TBLPROPERTIES " +
      s"('graft.flippedAt'='${System.currentTimeMillis()}')")
    ()
  }

  /** Drop every version outside the retention window (plus any orphan
    * ABOVE current — a crashed rewrite's leftovers, dropped
    * unconditionally), then reclaim unreferenced segments. A
    * predecessor version is RETAINED when either knob covers it:
    *
    *  - COUNT grace: `v >= current - g`, `g` =
    *    `spark.graft.bucketing.graceVersions` (default 1) — how many
    *    rewrites an in-flight plan may overlap;
    *  - TIME grace: the version's successor FLIPPED less than
    *    `spark.graft.bucketing.vacuumRetainMs` ago (default 0 = off) —
    *    reader exposure is measured in seconds, not rewrites. The flip
    *    instant is the `graft.flippedAt` property [[flipView]] records
    *    (fallback: the successor's catalog createTime, the legacy
    *    behavior) — so a background compaction that wrote its version
    *    minutes before flipping it doesn't eat the window.
    *
    * BOTH knobs are read from the session RUNNING THE MAINTENANCE.
    * With manifests the retained versions cost METADATA plus only the
    * segments unique to them — cold segments are shared, so the grace
    * window no longer rents table-sized copies. `graceOverride` is the
    * internal hard-removal path ([[purgeTombstoned]]): `Some(0)`
    * ignores both knobs. */
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
    // FLIPPED (recorded property; fallback: successor createTime)
    def supersededAt(v: Int): Long = {
      val succ = existing.find(_ > v).getOrElse(current)
      val meta = catalogOf(spark).getTableMetadata(
        TableIdentifier(physName(table, succ)))
      meta.properties.get("graft.flippedAt").flatMap(s =>
        scala.util.Try(s.toLong).toOption).getOrElse(meta.createTime)
    }
    vs.foreach { case (phys, v) =>
      if (v > current) dropPhys(spark, phys)
      else if (v < current - grace &&
          (retainMs <= 0L || now - supersededAt(v) >= retainMs))
        dropPhys(spark, phys)
    }
    sweepSegments(spark, table)
  }

  /** Reclaim segment dirs referenced by NO remaining version table —
    * the refcount vacuum of the manifest design. Segments being
    * written right now (an in-flight background compaction, or a
    * finished one awaiting finalize) are protected by
    * [[protectedSegs]]; crash orphans from dead processes have no
    * protection entry and are reclaimed here. */
  private[sources] def sweepSegments(spark: SparkSession, table: String): Unit = {
    if (!heldLeases.containsKey(table))
      throw new IllegalStateException(
        s"refusing to sweep segments of $table without the writer lease: " +
          "a sweep by a non-owner can delete a foreign in-flight segment")
    val dd = dataDir(spark, table)
    val fs = hadoopFs(spark, dd)
    if (!fs.exists(dd)) return
    val referenced: Set[String] = listVersions(spark, table).flatMap {
      case (phys, _) =>
        val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
        if (isManifest(meta))
          catalogOf(spark).listPartitions(TableIdentifier(phys))
            .map(p => new org.apache.hadoop.fs.Path(p.location).getName)
        else Nil
    }.toSet
    fs.listStatus(dd).foreach { s =>
      val n = s.getPath.getName
      if (s.isDirectory && !referenced(n) && !protectedSegs.containsKey(n))
        fs.delete(s.getPath, true)
    }
  }

  // ------------------------------------------------------------------
  // Segment + version-table primitives
  // ------------------------------------------------------------------

  private def newSegName(): String =
    "seg_" + java.util.UUID.randomUUID().toString.replace("-", "")

  /**
   * Write `df` as one immutable bucketed segment of `table`: ≤
   * `buckets` files (the repartition co-locates each bucket's rows in
   * one task; Spark's bucketed writer names the files with their
   * bucket id, which is how the manifest scan re-associates them).
   * Spark only accepts `bucketBy` through `saveAsTable`, so the write
   * goes through a transient uniquely-named EXTERNAL table pointed at
   * the segment dir — dropped immediately after; external drop keeps
   * the files. Returns the segment dir.
   */
  private def writeSegmentFiles(spark: SparkSession, table: String,
      df: DataFrame, bucketCol: String, buckets: Int, segName: String)
      : org.apache.hadoop.fs.Path =
    writeSegmentFilesWithStats(spark, table, df, bucketCol, buckets,
      segName, Nil)._1

  /**
   * Write one immutable segment AND return its registration params.
   * Zone stats ride the WRITE JOB itself via `Dataset.observe` (one
   * CollectMetrics node over the rows being written) — no second
   * read of the files the writer just produced, which would double
   * append I/O for every stats-tracked ingest table. Falls back to a
   * read-back ([[segmentRegParams]]) only if the observation yields
   * nothing.
   */
  private def writeSegmentFilesWithStats(spark: SparkSession, table: String,
      df: DataFrame, bucketCol: String, buckets: Int, segName: String,
      statsCols: Seq[String], origin: String = "ingest")
      : (org.apache.hadoop.fs.Path, Map[String, String]) = {
    val dir = new org.apache.hadoop.fs.Path(dataDir(spark, table), segName)
    val tmp = s"${table}__segw_$segName"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    val obs = if (statsCols.isEmpty) null
      else new org.apache.spark.sql.Observation(s"graft_stats_$segName")
    try {
      import org.apache.spark.sql.functions.{min, max}
      val src = if (obs == null) df else {
        val aggs = statsCols.flatMap(c => Seq(
          min(col(c)).cast("string").as(s"min_$c"),
          max(col(c)).cast("string").as(s"max_$c")))
        df.observe(obs, aggs.head, aggs.tail: _*)
      }
      src.repartition(buckets, col(bucketCol))
        .write.mode("overwrite").format("parquet").option("path", dir.toString)
        .bucketBy(buckets, bucketCol).sortBy(bucketCol)
        .saveAsTable(tmp)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tmp") // even on a failed write
    val bytes = segmentBytes(spark, dir.toUri)
    // the registration instant rides the segment (carried by reference
    // through every later version) — the grain [[readAsOf]] resolves
    // at, since appends land in the CURRENT version without a flip.
    // `graft.origin` separates INGEST segments (new rows arriving)
    // from MAINTENANCE ones (merges/rewrites of rows already
    // delivered) — what [[segmentFeed]] keys exactly-once delivery on
    val at = nextStamp(table)
    val base = Map("graft.bytes" -> bytes.toString,
      "graft.appendedAt" -> at.toString,
      "graft.origin" -> origin)
    val params =
      if (obs == null || bytes == 0L) base
      else {
        // the write action already completed, so the metrics are
        // normally available immediately; the timeout guards against
        // a lost-listener edge (then: read back, never hang a writer)
        val m: Map[String, Any] = try
          scala.concurrent.Await.result(
            scala.concurrent.Future(obs.get)(
              scala.concurrent.ExecutionContext.global),
            scala.concurrent.duration.Duration(30, "s"))
        catch { case _: Throwable => Map.empty }
        if (m.isEmpty) // observation lost (shouldn't happen): read back
          segmentRegParams(spark, dir.toString, statsCols, origin, at)
        else base ++ statsCols.flatMap { c =>
          Option(m.getOrElse(s"min_$c", null)).map(v =>
            s"graft.min.$c" -> String.valueOf(v)).toSeq ++
            Option(m.getOrElse(s"max_$c", null)).map(v =>
              s"graft.max.$c" -> String.valueOf(v))
        }
      }
    (dir, params)
  }

  /** Create version table `table__v{next}` — the manifest: an external
    * partitioned+bucketed parquet table whose partitions reference the
    * given segment dirs, each carrying its registration-time metadata
    * (bytes + zone stats) as partition parameters. Pure metadata; no
    * data I/O. */
  private def createVersionTable(spark: SparkSession, table: String, next: Int,
      dataSchema: StructType, bucketCol: String, buckets: Int,
      segs: Seq[SegRef], statsCols: Seq[String] = Nil): String = {
    val phys = physName(table, next)
    dropPhys(spark, phys) // orphan of a crashed writer
    val root = new org.apache.hadoop.fs.Path(warehouse(spark), phys)
    hadoopFs(spark, root).mkdirs(root) // empty root (data lives in segments)
    val props = if (statsCols.isEmpty) ""
      else s" TBLPROPERTIES ('graft.statsCols'='${statsCols.mkString(",")}')"
    spark.sql(
      s"""CREATE TABLE $phys (${dataSchema.toDDL}, `$SegCol` STRING)
         |USING parquet PARTITIONED BY (`$SegCol`)
         |CLUSTERED BY (`$bucketCol`) SORTED BY (`$bucketCol`)
         |INTO $buckets BUCKETS
         |LOCATION '$root'$props""".stripMargin)
    // ONE catalog call for the whole manifest, not one round-trip per
    // segment — a version of a long-running table references many
    // segments, and at a real metastore each call is an RPC. The
    // programmatic API (not ADD PARTITION SQL) because partitions
    // carry PARAMETERS: the per-segment bytes + zone stats.
    if (segs.nonEmpty) registerSegments(spark, phys, segs)
    phys
  }

  /** Register segments as partitions of a version table, carrying
    * their parameters (bytes + zone stats). One catalog call. */
  private def registerSegments(spark: SparkSession, phys: String,
      segs: Seq[SegRef]): Unit = {
    import org.apache.spark.sql.catalyst.catalog.CatalogTablePartition
    val cat = catalogOf(spark)
    val storage = cat.getTableMetadata(TableIdentifier(phys)).storage
    cat.createPartitions(TableIdentifier(phys), segs.map { s =>
      CatalogTablePartition(
        spec = Map(SegCol -> s.name),
        storage = storage.copy(locationUri =
          Some(new org.apache.hadoop.fs.Path(s.location).toUri)),
        parameters = s.params)
    }, ignoreIfExists = false)
  }

  /**
   * The metadata recorded on a segment partition at registration:
   * `graft.bytes` (one FS listing of the dir the writer just wrote —
   * the last time anyone needs to list it) plus, when the table
   * tracks zone stats, `graft.min/max.{col}` from one column-pruned
   * aggregate over the new segment (segment-sized, parquet
   * footer-friendly). Values serialize as strings; numeric columns
   * compare as decimals at prune time, everything else
   * lexicographically (safe for the string/date/ISO-timestamp types
   * zone stats make sense for).
   */
  /** Spec hook: stats computed by READING BACK a just-written segment
    * (the fallback path). The common path observes stats on the write
    * job itself and must not grow this. */
  private[sources] val statsReadbacks = new java.util.concurrent.atomic.AtomicLong

  /** Strictly-monotonic per-table registration stamps: two appends
    * inside the same millisecond must not share an instant, or a feed
    * consumer polling between them could miss the second forever. The
    * single-writer lease makes this in-JVM counter authoritative. */
  private val lastStamp =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def nextStamp(table: String): Long =
    lastStamp.compute(table, (_, prev) => {
      val now = System.currentTimeMillis()
      if (prev == null || now > prev) now else prev + 1L
    })

  private def segmentRegParams(spark: SparkSession, dir: String,
      statsCols: Seq[String], origin: String = "ingest",
      at: Long = -1L): Map[String, String] = {
    val bytes = segmentBytes(spark, new org.apache.hadoop.fs.Path(dir).toUri)
    val base = Map("graft.bytes" -> bytes.toString,
      "graft.appendedAt" ->
        (if (at >= 0) at else System.currentTimeMillis()).toString,
      "graft.origin" -> origin)
    // an EMPTY segment (a write whose frame had no rows) has no files
    // to read stats from — and no rows to prune against
    if (statsCols.nonEmpty && bytes > 0L) statsReadbacks.incrementAndGet()
    if (statsCols.isEmpty || bytes == 0L) base
    else {
      import org.apache.spark.sql.functions.{min, max}
      val df = spark.read.parquet(dir)
      val aggs = statsCols.flatMap(c =>
        Seq(min(col(c)).cast("string"), max(col(c)).cast("string")))
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      base ++ statsCols.zipWithIndex.flatMap { case (c, i) =>
        val lo = Option(row.getString(2 * i))
        val hi = Option(row.getString(2 * i + 1))
        lo.map(s"graft.min.$c" -> _).toSeq ++ hi.map(s"graft.max.$c" -> _)
      }
    }
  }

  /** Write df as a bucketed+sorted table (overwrite): one new segment,
    * a fresh version manifest referencing only it. Overwrite semantics
    * under concurrent writers are last-wins (serialized by the table
    * lock) — unlike [[rewriteBucketed]], which is read-modify-write
    * and therefore CAS-fails a lost update. `statsCols` opts the table
    * into per-segment zone stats: every segment written from here on
    * records min/max of those columns in the manifest, and
    * [[readSegmentsPruned]] skips segments a range predicate cannot
    * touch — free skipping for ingest tables whose appends are
    * naturally clustered (time, monotone ids). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, statsCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    lockFor(table).synchronized {
      ensureWriterLease(spark, table)
      cancelPending(spark, table)
      val next = currentPhys(spark, table).map(_._2 + 1).getOrElse(1)
      val seg = newSegName()
      val (dir, params) = writeSegmentFilesWithStats(spark, table, df,
        bucketCol, buckets, seg, statsCols)
      createVersionTable(spark, table, next,
        df.schema, bucketCol, buckets,
        Seq(SegRef(seg, dir.toString, params)), statsCols)
      flipView(spark, table, next)
      vacuumVersions(spark, table, next)
    }
  }

  /**
   * Write a small (driver-boundable) frame as a single-file managed
   * parquet table — model artifacts, filter banks, codebooks. Same
   * versioned-view flip discipline, but PLAIN versions (no manifest:
   * the whole table is one file, so copy-vs-reference is moot).
   */
  def writeSmallTable(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    lockFor(table).synchronized {
      ensureWriterLease(spark, table)
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
   * continuous-ingest path: the batch lands as ONE new segment (≤
   * `buckets` files, already hashed and sorted) registered as one
   * partition of the CURRENT version. Batch-sized I/O plus one
   * catalog call; the standing data is never touched. (At high batch
   * frequency segments accumulate — [[maybeCompactBucketedAsync]] is
   * the standard companion.) Appends go to the current version in
   * place — an append is not a rewrite; readers of the grace
   * predecessor simply don't see the newest batch yet, the same
   * read-your-writes semantics a snapshot reader of any LSM store
   * has. Safe to run while an out-of-band compaction is in flight:
   * the new segment is not in the compaction's hot set, so the
   * finalize carries it into the next version BY REFERENCE.
   */
  def appendBucketed(df: DataFrame, table: String, bucketCol: String): Unit = {
    val spark = df.sparkSession
    lockFor(table).synchronized {
      ensureWriterLease(spark, table)
      val (phys, _) = currentPhys(spark, table).getOrElse(
        throw new IllegalArgumentException(s"$table does not exist"))
      val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
      val spec = meta.bucketSpec
        .getOrElse(throw new IllegalArgumentException(s"$table is not bucketed"))
      require(spec.bucketColumnNames == Seq(bucketCol),
        s"$table is bucketed by ${spec.bucketColumnNames}, not $bucketCol")
      if (isManifest(meta)) {
        val seg = newSegName()
        val (dir, params) = writeSegmentFilesWithStats(spark, table, df,
          bucketCol, spec.numBuckets, seg, statsColsOf(meta))
        registerSegments(spark, phys, Seq(SegRef(seg, dir.toString, params)))
      } else {
        // legacy plain bucketed table (pre-manifest layout / created
        // outside this module): in-place bucketed append, as before
        df.repartition(spec.numBuckets, col(bucketCol))
          .write.mode("append").format("parquet")
          .bucketBy(spec.numBuckets, bucketCol).sortBy(bucketCol)
          .saveAsTable(phys)
      }
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
      ensureWriterLease(spark, table)
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
   * bucket spec — the shared machinery under full compaction (f =
   * identity), physical tombstone purges (f = anti-join the
   * tombstones), and relabel folds. Reads the CURRENT version's
   * segment files as plain parquet (exactly the manifest's file set,
   * never a stale listing), writes `f` of them as ONE new segment,
   * flips a fresh manifest, and vacuums. Inherently O(table) — `f`
   * must see every row; that is the contract of a rewrite, not a
   * design cost.
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
      ensureWriterLease(spark, table)
      cancelPending(spark, table)
      val (phys, v) = currentPhys(spark, table).getOrElse(
        throw new IllegalArgumentException(s"$table does not exist"))
      if (v != v0) throw new java.util.ConcurrentModificationException(
        s"$table advanced v$v0 -> v$v under a concurrent writer; " +
          "rewrite aborted (lost-update guard — single-writer contract violated)")
      val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
      val spec = meta.bucketSpec.getOrElse(
        throw new IllegalArgumentException(s"$table is not bucketed"))
      val bcol = spec.bucketColumnNames.head
      val next = v + 1
      val dirs = segmentsOf(spark, phys).map(_.location)
      val in = spark.read.parquet(dirs: _*)
      val seg = newSegName()
      val stats = statsColsOf(meta)
      val (dir, params) = writeSegmentFilesWithStats(spark, table, f(in),
        bcol, spec.numBuckets, seg, stats, origin = "maintenance")
      createVersionTable(spark, table, next,
        StructType(meta.schema.filterNot(_.name == SegCol)),
        bcol, spec.numBuckets,
        Seq(SegRef(seg, dir.toString, params)), stats)
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
   * is the operation's whole contract — with manifests this is also
   * the step that actually DELETES the old segments carrying the
   * purged rows (refcount falls to zero once the old manifests drop).
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
   * Compact a bucketed table back to one segment (one file per
   * bucket) — the FULL form: every row rewrites. The periodic
   * companion to [[appendBucketed]] when bounded segment count
   * matters more than minimal I/O; the incremental form is
   * [[compactBucketedPartial]] / [[maybeCompactBucketedAsync]], whose
   * merge I/O is sized by the small segments only. Invisible to
   * readers: they resolve the new version on their next query,
   * in-flight plans finish against the grace-retained previous
   * version.
   */
  def compactBucketed(spark: SparkSession, table: String): Unit =
    rewriteBucketed(spark, table, identity)

  /** Spec hook: calls that paid per-segment directory listings for a
    * FILE count. The manifest-table trigger paths must not grow this
    * — `segmentCount` bounds files-per-bucket from the catalog alone;
    * a count here is a legacy in-place layout. */
  private[sources] val fileListings = new java.util.concurrent.atomic.AtomicLong

  /** Data-file count under the CURRENT version's segments — one
    * directory listing per segment, the same listings every scan of
    * the table pays. */
  def dataFileCount(spark: SparkSession, table: String): Long =
    currentDataDirs(spark, table).map { d =>
      fileListings.incrementAndGet()
      val path = new org.apache.hadoop.fs.Path(d)
      val fs = hadoopFs(spark, path)
      if (!fs.exists(path)) 0L
      else fs.listStatus(path).count { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }.toLong
    }.sum

  /**
   * The AUTO-compaction policy the continuous-ingest loops run
   * between batches (the LSM analogy [[compactBucketed]] cites, made
   * self-maintaining): when the table's data-file count exceeds
   * `maxFilesPerBucket × buckets`, compact back to one file per
   * bucket. The trigger costs the same listings a scan pays; the
   * compaction is a full rewrite amortized over the batches that
   * accumulated the files. Returns whether a compaction ran, so the
   * streaming loops' specs and probes can observe the trigger.
   * `maxFilesPerBucket ≤ 0` disables the policy (the manual
   * out-of-band path).
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
  // Partial + out-of-band compaction — the maintenance path that never
  // pays corpus cost. Two composable halves:
  //
  //  - PARTIAL (segment merge): the smallest segments merge into one
  //    through a bucketed Spark job; every other segment is carried
  //    into the next version BY REFERENCE — the new manifest lists the
  //    same physical paths; zero bytes of cold data move. Selection is
  //    geometric (LSM tiering): smallest-first, recruiting the next
  //    larger segment only when the bytes already merged pay for it —
  //    so a row is re-merged O(log(corpus/batch)) times over the
  //    table's life and each flip writes ≈ the merged bytes.
  //  - OUT-OF-BAND: the trigger pins the hot segment set and hands the
  //    merge to a maintenance thread; the ingest loop keeps appending
  //    NEW segments meanwhile. The NEXT trigger call — still on the
  //    single-writer loop thread, between batches — finalizes: build
  //    the v+1 manifest as (all current segments − hot) + merged —
  //    which carries the append delta automatically, by reference —
  //    CAS-flip the view, vacuum. All catalog mutations for the
  //    logical table stay on the writer thread; the background thread
  //    only reads pinned immutable files and writes one unreferenced
  //    segment (plus its transient uniquely-named writer table).
  //
  // Crash anywhere before the flip leaves an unreferenced orphan
  // (version table and/or segment dir) that the standard vacuum +
  // refcount sweep clears; the in-memory pending map dying with the
  // process just means the next trigger starts fresh.
  // ------------------------------------------------------------------

  /** Segments to merge, (name, bytes) sorted smallest-first: always at
    * least two; extend while the remaining segment count would still
    * exceed the bound (guarantees the trigger clears) or while the
    * accumulated bytes pay for the next tier (`2·merged ≥ next` — the
    * geometric rule that bounds lifetime re-merge cost). Empty when
    * the table is already within bounds. */
  private[sources] def chooseHotSegments(segs: Seq[(String, Long)],
      maxSegments: Int): Seq[String] = {
    if (segs.size <= math.max(1, maxSegments)) return Nil
    val sorted = segs.sortBy(_._2)
    val hot = scala.collection.mutable.ArrayBuffer[String]()
    var sum = 0L
    var i = 0
    while (i < sorted.size &&
        (hot.size < 2 ||
         (sorted.size - hot.size + 1) > maxSegments ||
         sum * 2 >= sorted(i)._2)) {
      hot += sorted(i)._1; sum += sorted(i)._2; i += 1
    }
    hot.toSeq
  }

  /** Spec hook: FS listings paid by segment-size lookups. The common
    * trigger path must not grow this — sizes ride the catalog as the
    * `graft.bytes` partition parameter; a listing here means a legacy
    * partition registered before the parameter existed. */
  private[sources] val sizeListings = new java.util.concurrent.atomic.AtomicLong

  private def segmentBytes(spark: SparkSession, loc: java.net.URI): Long = {
    sizeListings.incrementAndGet()
    val path = new org.apache.hadoop.fs.Path(loc)
    val fs = hadoopFs(spark, path)
    if (!fs.exists(path)) 0L
    else fs.listStatus(path).collect {
      case s if s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith(".") => s.getLen
    }.sum
  }

  /** (name, bytes) per segment — from the registration-time
    * `graft.bytes` partition parameter (catalog-only, zero FS RPCs on
    * the common path); falls back to one listing per legacy partition
    * that predates the parameter. */
  private def segmentSizes(spark: SparkSession,
      segs: Seq[SegRef]): Seq[(String, Long)] =
    segs.map { r =>
      val b = r.params.get("graft.bytes")
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .getOrElse(segmentBytes(spark,
          new org.apache.hadoop.fs.Path(r.location).toUri))
      (r.name, b)
    }

  /**
   * Merge the smallest segments when the CURRENT version holds more
   * than `maxSegments` of them, carrying every other segment into the
   * next version by reference (content-identical to
   * [[compactBucketed]], law-tested; bytes written ≈ the merged
   * segments only). Each segment holds at most one file per bucket,
   * so `maxSegments` bounds files-per-bucket the way the old
   * file-count knob did. Returns whether a merge ran. Synchronous —
   * the out-of-band form is [[maybeCompactBucketedAsync]].
   */
  def compactBucketedPartial(spark: SparkSession, table: String,
      maxSegments: Int = 8): Boolean = lockFor(table).synchronized {
    ensureWriterLease(spark, table)
    cancelPending(spark, table)
    val (phys, v) = currentPhys(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table does not exist"))
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(s"$table is not bucketed"))
    if (!isManifest(meta)) { // legacy layout: full rewrite migrates it
      rewriteBucketedImpl(spark, table, identity, None); return true
    }
    val segs = segmentsOf(spark, phys)
    val sizes = segmentSizes(spark, segs)
    val hot = chooseHotSegments(sizes, maxSegments).toSet
    if (hot.isEmpty) return false
    val cold = segs.filterNot(r => hot(r.name))
    val bcol = spec.bucketColumnNames.head
    val hotDirs = segs.collect { case r if hot(r.name) => r.location }
    val seg = newSegName()
    val stats = statsColsOf(meta)
    val (dir, params) = writeSegmentFilesWithStats(spark, table,
      spark.read.parquet(hotDirs: _*), bcol, spec.numBuckets, seg, stats,
      origin = "maintenance")
    createVersionTable(spark, table, v + 1,
      StructType(meta.schema.filterNot(_.name == SegCol)),
      bcol, spec.numBuckets,
      cold :+ SegRef(seg, dir.toString, params), stats)
    flipView(spark, table, v + 1)
    vacuumVersions(spark, table, v + 1)
    true
  }

  private final class PendingCompaction(val fromV: Int, val hot: Set[String],
      val segName: String, val segDir: String,
      // non-null on a FOLD rewrite (rewriteBucketedAsync): applied by
      // the background job to the pinned segments AND by the finalize
      // step to the append delta, so the flipped version is f(every
      // row) even though rows kept arriving during the background run
      val transform: DataFrame => DataFrame = null,
      // runs under the table lock right after the flip (the commit
      // point) — the fold's companion state change (e.g. clearing the
      // folded relabel rows); must be idempotent wrt a crash between
      // flip and callback
      val onFinalize: SparkSession => Unit = null) {
    @volatile var finished = false
    @volatile var failure: Throwable = null
    @volatile var future: java.util.concurrent.Future[_] = null
    /** registration params (bytes + zone stats) the background write
      * observed for its output segment — consumed at finalize */
    @volatile var segParams: Map[String, String] = null
    /** exactly-one-cleaner guard between a cancel and the job's own
      * post-run check */
    val cleaned = new java.util.concurrent.atomic.AtomicBoolean(false)
  }
  private val pending =
    new java.util.concurrent.ConcurrentHashMap[String, PendingCompaction]()
  /** Segment dirs that must not be swept: in-flight background writes
    * and finished-but-unfinalized merge outputs. Keyed by dir NAME
    * (segment names are globally unique). */
  private val protectedSegs =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
  private lazy val maintenancePool =
    java.util.concurrent.Executors.newSingleThreadExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-maintenance"); t.setDaemon(true); t
      })

  /** Discard an in-flight background compaction (writer paths that are
    * about to change the version themselves call this under the table
    * lock). NEVER waits: if the background write already finished, its
    * unreferenced output is deleted here; if it is still running, the
    * job notices on completion that its pending entry is gone and
    * deletes its own output (the `cleaned` flag makes exactly one of
    * the two clean). Wasted work, never wrong state, no writer stall. */
  private def cancelPending(spark: SparkSession, table: String): Unit = {
    val p = pending.remove(table)
    if (p != null && p.finished && p.cleaned.compareAndSet(false, true))
      discardSegment(spark, table, p)
  }

  private def discardSegment(spark: SparkSession, table: String,
      p: PendingCompaction): Unit = {
    try {
      spark.sql(s"DROP TABLE IF EXISTS ${table}__segw_${p.segName}")
      val path = new org.apache.hadoop.fs.Path(p.segDir)
      val fs = hadoopFs(spark, path)
      if (fs.exists(path)) fs.delete(path, true)
    } catch { case _: Throwable => () } // orphan sweep will reclaim
    finally protectedSegs.remove(p.segName)
    ()
  }

  /** Ops/test hook: an out-of-band compaction is in flight or awaiting
    * finalize for `table`. */
  def pendingMaintenance(table: String): Boolean = pending.containsKey(table)

  /** Tables with an out-of-band compaction in flight or awaiting
    * finalize — the quiesce/shutdown hooks iterate this. */
  def pendingTables: Seq[String] = {
    import scala.jdk.CollectionConverters._
    pending.keySet().asScala.toSeq
  }

  /** Test hook: block until the background WRITE (if any) completes —
    * the finalize still happens on the next trigger call. Returns
    * whether one was pending. */
  def awaitMaintenance(table: String): Boolean = {
    val p = pending.get(table)
    if (p == null) false
    else {
      val f = p.future
      if (f != null) { try f.get() catch { case _: Throwable => () } }
      while (!p.finished) Thread.sleep(5)
      true
    }
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
   *  1. a finished background merge is FINALIZED (new manifest =
   *     untouched segments + appends since the snapshot + the merged
   *     segment, all BY REFERENCE; the view CAS-flips; vacuum) — a
   *     pure-metadata step;
   *  2. else, if no merge is in flight and the current version holds
   *     more than `maxSegments` segments, the geometric merge of the
   *     smallest segments is enqueued on the maintenance thread and
   *     the call returns immediately;
   *  3. else no-op.
   *
   * The whole call runs under the table lock (trigger INCLUDED — the
   * version/segment snapshot, the pending registration, and the
   * submit are atomic against concurrent writers; a writer that lands
   * after the enqueue cancels the pending entry under the same lock,
   * so the background output is discarded, never finalized over a
   * foreign flip). Returns true only when a compaction FLIPPED this
   * call (step 1). A background failure is rethrown here — on the
   * writer thread, where the loop's error handling lives.
   * `maxSegments <= 0` disables the policy.
   */
  def maybeCompactBucketedAsync(spark: SparkSession, table: String,
      maxSegments: Int = 8): Boolean = {
    if (maxSegments <= 0) return false
    lockFor(table).synchronized {
      ensureWriterLease(spark, table)
      val p = pending.get(table)
      if (p != null) {
        if (!p.finished) return false
        pending.remove(table)
        if (p.failure != null) {
          if (p.cleaned.compareAndSet(false, true)) discardSegment(spark, table, p)
          throw p.failure
        }
        finalizeCompactionLocked(spark, table, p)
        return true
      }
      if (!spark.catalog.tableExists(table)) return false
      val (phys, v) = currentPhys(spark, table).getOrElse(return false)
      val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
      val spec = meta.bucketSpec.getOrElse(return false)
      if (!isManifest(meta)) return false // legacy layout: use the sync paths
      val segs = segmentsOf(spark, phys)
      val sizes = segmentSizes(spark, segs)
      val hot = chooseHotSegments(sizes, maxSegments)
      if (hot.isEmpty) return false
      enqueueAsync(spark, table, v, spec, segs.filter(r => hot.contains(r.name)),
        transform = null, onFinalize = null)
      false
    }
  }

  /** Register + submit a background segment write over `hotSegs`
    * (merged plain, or through `transform` for a fold rewrite). Caller
    * holds the table lock. */
  private def enqueueAsync(spark: SparkSession, table: String, v: Int,
      spec: org.apache.spark.sql.catalyst.catalog.BucketSpec,
      hotSegs: Seq[SegRef],
      transform: DataFrame => DataFrame,
      onFinalize: SparkSession => Unit): Unit = {
    val hotDirs = hotSegs.map(_.location)
    val segName = newSegName()
    val segDir = new org.apache.hadoop.fs.Path(dataDir(spark, table), segName)
    val pc = new PendingCompaction(v, hotSegs.map(_.name).toSet, segName,
      segDir.toString, transform, onFinalize)
    protectedSegs.put(segName, true)
    pending.put(table, pc)
    val bcol = spec.bucketColumnNames.head
    val buckets = spec.numBuckets
    val statsCols = statsColsOf(
      catalogOf(spark).getTableMetadata(TableIdentifier(physName(table, v))))
    // a fresh session for the background write: shared external
    // catalog (its transient writer table is uniquely named),
    // separate per-session state (no conf/cache races with the
    // loop's micro-batch session). Capped-pool scheduling: the merge
    // job's stages run in the low-share `graft_maintenance` pool so
    // a FAIR-mode deployment's live batches take cores first (under
    // default FIFO the property is inert).
    val bg = spark.newSession()
    bg.conf.set("spark.scheduler.pool", "graft_maintenance")
    pc.future = maintenancePool.submit(new Runnable {
      def run(): Unit = {
        try {
          val in = bg.read.parquet(hotDirs: _*)
          pc.segParams = writeSegmentFilesWithStats(bg, table,
            if (transform == null) in else transform(in),
            bcol, buckets, segName, statsCols, origin = "maintenance")._2
        } catch { case t: Throwable => pc.failure = t }
        finally {
          pc.finished = true
          // cancelled while running? then nobody will finalize or
          // clean this output — self-clean (exactly-once via flag)
          if ((pending.get(table) ne pc) &&
              pc.cleaned.compareAndSet(false, true))
            discardSegment(bg, table, pc)
        }
      }
    })
  }

  /**
   * OUT-OF-BAND WHOLE-TABLE REWRITE — [[rewriteBucketed]]'s async
   * form, the machinery that takes the last inline corpus-sized
   * maintenance job (the cluster-index relabel fold) off the ingest
   * thread. Enqueues a background job that writes `f` of every
   * CURRENT segment as one new segment; the NEXT trigger call (or
   * [[finalizeMaintenance]]) finalizes by rewriting the append DELTA
   * through the SAME `f` inline — delta-sized, never corpus-sized —
   * so the flipped version is `f(every row)` even though rows kept
   * arriving during the background run, then flips, runs
   * `onFinalize` (the fold's companion state change, e.g. clearing
   * the folded relabel rows — it runs after the flip, so it must be
   * idempotent against a crash between the two), and vacuums.
   *
   * Returns like [[maybeCompactBucketedAsync]]: true only when a
   * pending rewrite FLIPPED this call; the enqueueing call returns
   * false. No-ops (returns false) while a rewrite is in flight.
   * Legacy non-manifest tables fall back to the synchronous
   * [[rewriteBucketed]] + `onFinalize` inline (returns true).
   */
  def rewriteBucketedAsync(spark: SparkSession, table: String,
      f: DataFrame => DataFrame,
      onFinalize: SparkSession => Unit = null): Boolean =
    lockFor(table).synchronized {
      ensureWriterLease(spark, table)
      val p = pending.get(table)
      if (p != null) {
        if (!p.finished) return false
        pending.remove(table)
        if (p.failure != null) {
          if (p.cleaned.compareAndSet(false, true)) discardSegment(spark, table, p)
          throw p.failure
        }
        finalizeCompactionLocked(spark, table, p)
        return true
      }
      val (phys, v) = currentPhys(spark, table).getOrElse(
        throw new IllegalArgumentException(s"$table does not exist"))
      val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
      val spec = meta.bucketSpec.getOrElse(
        throw new IllegalArgumentException(s"$table is not bucketed"))
      if (!isManifest(meta)) {
        rewriteBucketedImpl(spark, table, f, None)
        if (onFinalize != null) onFinalize(spark)
        return true
      }
      enqueueAsync(spark, table, v, spec, segmentsOf(spark, phys), f, onFinalize)
      false
    }

  /** Step 1 of [[maybeCompactBucketedAsync]]: build the next manifest
    * (cold + delta by reference, plus the merged segment), flip,
    * vacuum — under the table lock, with the CAS lost-update guard.
    * Pure metadata: no data bytes move here. */
  private def finalizeCompactionLocked(spark: SparkSession, table: String,
      p: PendingCompaction): Unit = {
    val (phys, v) = currentPhys(spark, table).getOrElse(
      throw new IllegalStateException(s"$table vanished during compaction"))
    if (v != p.fromV) {
      // a foreign writer advanced the table while the merge ran — the
      // merge's output is stale (its hot segments may no longer be
      // part of the current manifest). Discard and fail loudly.
      if (p.cleaned.compareAndSet(false, true)) discardSegment(spark, table, p)
      throw new java.util.ConcurrentModificationException(
        s"$table advanced v${p.fromV} -> v$v during out-of-band compaction; " +
          "result discarded (single-writer contract violated)")
    }
    val meta = catalogOf(spark).getTableMetadata(TableIdentifier(phys))
    val spec = meta.bucketSpec.get
    // cold + appends-since-snapshot: everything currently referenced
    // that wasn't pinned. A plain merge carries it into v+1 BY
    // REFERENCE; a FOLD rewrite (transform != null) pinned the whole
    // table, so what remains is exactly the append delta — rewritten
    // through the same transform inline (delta-sized) so the flipped
    // version is f(every row)
    val stats = statsColsOf(meta)
    val remaining = segmentsOf(spark, phys).filterNot(r => p.hot(r.name))
    val carry: Seq[SegRef] =
      if (p.transform == null || remaining.isEmpty)
        remaining // by reference, registration metadata included
      else {
        val seg = newSegName()
        val (dir, params) = writeSegmentFilesWithStats(spark, table,
          p.transform(spark.read.parquet(remaining.map(_.location): _*)),
          spec.bucketColumnNames.head, spec.numBuckets, seg, stats,
          origin = "maintenance")
        Seq(SegRef(seg, dir.toString, params))
      }
    createVersionTable(spark, table, p.fromV + 1,
      StructType(meta.schema.filterNot(_.name == SegCol)),
      spec.bucketColumnNames.head, spec.numBuckets,
      carry :+ SegRef(p.segName, p.segDir,
        Option(p.segParams).getOrElse(
          segmentRegParams(spark, p.segDir, stats,
            origin = "maintenance"))), stats)
    flipView(spark, table, p.fromV + 1)
    protectedSegs.remove(p.segName)
    if (p.onFinalize != null) p.onFinalize(spark)
    vacuumVersions(spark, table, p.fromV + 1)
  }

  /**
   * Finalize a finished out-of-band compaction NOW — the quiesce hook
   * ([[graft.streaming.DocumentStreams]] &c. call it from their
   * stream-stop path): a stopped ingest loop otherwise strands a
   * finished background merge as a pending orphan until some future
   * trigger runs. Waits for an in-flight background WRITE to finish
   * (bounded by the merge itself), then runs the normal finalize.
   * Returns true if a compaction flipped. No-op when nothing is
   * pending.
   */
  def finalizeMaintenance(spark: SparkSession, table: String): Boolean = {
    val p = pending.get(table)
    if (p == null) return false
    awaitMaintenance(table)
    lockFor(table).synchronized {
      ensureWriterLease(spark, table)
      val q = pending.remove(table)
      if (q == null) return false
      if (q.failure != null) {
        if (q.cleaned.compareAndSet(false, true)) discardSegment(spark, table, q)
        throw q.failure
      }
      finalizeCompactionLocked(spark, table, q)
      true
    }
  }

  // ------------------------------------------------------------------
  // Cross-table atomic EPOCHS — one commit point for multi-table
  // indexes. The versioned views make each TABLE's flip atomic, but an
  // index made of several tables (IVF-PQ: centroids + codebooks +
  // codes; MinHash: bands + shingles) rebuilt table-by-table exposes a
  // racing reader to a mixed state — new quantizer with old codes for
  // one resolution. The epoch layer closes that: member tables of
  // generation N are separate logical tables (`{base}_{member}_g{N}`),
  // a rebuild writes the ENTIRE next generation first, and the commit
  // is ONE atomic catalog op — the `{base}_epoch` view flip — done
  // LAST. Readers resolve member names through the epoch before
  // reading, so every query sees one generation throughout: all-old or
  // all-new, never mixed. Generation N−1 is retained as the reader
  // grace window (an in-flight query that resolved the old epoch still
  // finds its tables); everything older sweeps at the next rebuild.
  // Epoch 0 is the legacy flat layout (`{base}_{member}`) — indexes
  // that never rebuild never pay the indirection.
  // ------------------------------------------------------------------

  private val EpochVer = """SELECT (\d+) AS epoch""".r

  /** Current generation of the table group `base` (0 = flat legacy
    * names; no epoch view yet). One catalog lookup, no Spark job. */
  def currentEpoch(spark: SparkSession, base: String): Int = {
    val id = TableIdentifier(s"${base}_epoch")
    val cat = catalogOf(spark)
    if (!cat.tableExists(id)) 0
    else cat.getTableMetadata(id).viewText
      .flatMap(t => EpochVer.findFirstMatchIn(t))
      .map(_.group(1).toInt).getOrElse(0)
  }

  /** Resolve a member table's logical name at the CURRENT epoch —
    * every reader of a multi-table index goes through this once per
    * query, so all member reads of that query share one generation. */
  def epochMember(spark: SparkSession, base: String, member: String): String = {
    val g = currentEpoch(spark, base)
    if (g == 0) s"${base}_$member" else s"${base}_${member}_g$g"
  }

  /**
   * Rebuild a multi-table index atomically: `build` receives a
   * member→name resolver for generation g+1 and must write EVERY
   * member table through it; only after all of them exist does the
   * epoch view flip (the single atomic commit). Crash-safe: a crash
   * mid-build leaves next-generation orphans the next rebuild drops
   * and re-creates (the epoch still points at the old generation, so
   * readers never see the half-built one). After the flip, the
   * superseded generation is RETAINED (reader grace, one generation)
   * and all older generations sweep.
   */
  def rebuildEpoch(spark: SparkSession, base: String, members: Seq[String])
      (build: (String => String) => Unit): Unit =
    lockFor(s"${base}_epoch").synchronized {
      ensureWriterLease(spark, s"${base}_epoch")
      val g = currentEpoch(spark, base)
      val next = g + 1
      val nameOf = (m: String) => s"${base}_${m}_g$next"
      members.foreach(m => dropLogical(spark, nameOf(m))) // crashed-rebuild orphans
      build(nameOf)
      val eview = s"${base}_epoch"
      if (catalogOf(spark).tableExists(TableIdentifier(eview)))
        spark.sql(s"ALTER VIEW $eview AS SELECT $next AS epoch")
      else
        spark.sql(s"CREATE VIEW $eview AS SELECT $next AS epoch")
      // grace: the newest `spark.graft.epoch.graceGenerations`
      // superseded generations (default 1 — the table layer's
      // graceVersions twin) survive for in-flight readers that
      // resolved an old epoch; everything older (including the flat
      // epoch-0 layout once it falls out of the window) sweeps now.
      // A reporting/batch reader slower than one rebuild cycle sets
      // the knob ≥ its expected overlap in rebuilds — the same
      // exposure knob the version layer's vacuum has, so neither
      // layer hardwires how slow a reader may be.
      val grace = math.max(1,
        spark.conf.get("spark.graft.epoch.graceGenerations", "1").toInt)
      members.foreach { m =>
        val db = spark.catalog.currentDatabase
        catalogOf(spark).listTables(db, s"${base}_${m}_g*").foreach { id =>
          val suffix = id.table.stripPrefix(s"${base}_${m}_g")
          if (suffix.nonEmpty && suffix.forall(_.isDigit) &&
              suffix.toInt < next - grace)
            dropLogical(spark, id.table)
        }
        if (next - grace > 0 && spark.catalog.tableExists(s"${base}_$m"))
          dropLogical(spark, s"${base}_$m") // flat layout = generation 0
      }
    }

  /** Drop an epoch-grouped index: every generation of every member,
    * and the epoch pointer itself. */
  def dropEpochGroup(spark: SparkSession, base: String,
      members: Seq[String]): Unit = {
    members.foreach { m =>
      if (spark.catalog.tableExists(s"${base}_$m")) dropLogical(spark, s"${base}_$m")
      val db = spark.catalog.currentDatabase
      catalogOf(spark).listTables(db, s"${base}_${m}_g*").foreach { id =>
        val suffix = id.table.stripPrefix(s"${base}_${m}_g")
        if (suffix.nonEmpty && suffix.forall(_.isDigit))
          dropLogical(spark, id.table)
      }
    }
    if (spark.catalog.tableExists(s"${base}_epoch"))
      spark.sql(s"DROP VIEW ${base}_epoch")
    releaseWriterLease(spark, s"${base}_epoch")
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
