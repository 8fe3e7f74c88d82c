package graft

import org.apache.spark.sql.SparkSession

/**
 * One-call session entry point for engine users: a SparkSession wired
 * the way every graft component expects — AQE on, UTC, sane local
 * shuffle parallelism, all custom expressions SQL-registered and the
 * custom planner strategies injected.
 *
 * Cluster deployments can instead set
 * `spark.sql.extensions=graft.GraftExtensions` on any session builder
 * of their own.
 */
object Graft {

  def session(master: String = "local[*]", shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    attach(spark)
    spark
  }

  /** Wire graft's functions + strategies onto an existing session. */
  def attach(spark: SparkSession): SparkSession = {
    GraftExtensions.register(spark)
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    spark
  }

  /**
   * Operability facade — the reference's `INFOCLUSTER` / `sendReply`
   * introspection surface (reference src/cluster.c:1668-1756,
   * src/mr.h:244-252) re-expressed for a Spark deployment: one tall
   * (section, key, value) DataFrame a user can query, show, or join.
   *
   * Sections map the cluster concepts to their Spark owners:
   *  - `engine`    — node identity/topology (MyId/MyRunId/nodes →
   *                  app id, master, parallelism, slot space, AQE);
   *  - `function`  — every graft SQL function and whether THIS
   *                  session has it registered;
   *  - `strategy`  — injected planner strategies;
   *  - `table`     — persistent catalog tables (the engine's standing
   *                  indexes live here);
   *  - `index`     — tombstone freshness per maintained index base
   *                  (counts are tombstone-table-sized — never a scan
   *                  of the index itself);
   *  - `epoch`     — multi-table index groups: current generation,
   *                  members, and crashed-rebuild orphans;
   *  - `stream`    — active structured-streaming queries;
   *  - `lease`     — writer locks on the warehouse: owner (this
   *                  driver or a foreign pid@host) + heartbeat age.
   *
   * Everything is driver-side catalog metadata except the tombstone
   * counts, which are bounded by [[graft.sources.Bucketing]]'s purge
   * discipline (a big tombstone set is overdue for a purge).
   */
  def info(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    val engine = Seq(
      ("engine", "spark_version", spark.version),
      ("engine", "master", sc.master),
      ("engine", "app_id", sc.applicationId),
      ("engine", "default_parallelism", sc.defaultParallelism.toString),
      ("engine", "shuffle_partitions",
        spark.conf.get("spark.sql.shuffle.partitions", "200")),
      ("engine", "aqe_enabled",
        spark.conf.get("spark.sql.adaptive.enabled", "false")),
      ("engine", "slots", graft.core.Slots.NumSlots.toString))
    val fns = GraftExtensions.functions.map(_._1).sorted.map { n =>
      ("function", n,
        if (spark.catalog.functionExists(n)) "registered" else "absent")
    }
    val strat = Seq(("strategy", "topk_per_key",
      if (spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
        "injected" else "absent"))
    val allTables = spark.catalog.listTables().collect().toSeq
      .filter(!_.isTemporary)
    // versioned physical tables (`name__v3`) are an implementation
    // detail of Bucketing's view layer — the facade reports the
    // LOGICAL tables users query, like any manifest-backed format...
    val tables = allTables
      .filter(t => !t.name.matches(".*__v\\d+$"))
      // transient segment-writer tables (manifest layer's bucketed
      // write vehicle) — dropped within their write; hide the race
      .filter(t => !t.name.contains("__segw_"))
      .sortBy(_.name)
      .map(t => ("table", t.name, t.tableType.toLowerCase))
    // ...plus one row per versioned table showing its manifest state.
    // The CURRENT version is what the view POINTS AT (read without the
    // recovery side effect — reporting must not mutate), not the max
    // on disk: a crashed rewrite's orphan ABOVE the flipped version is
    // reported distinctly, never as current.
    val versioned = allTables
      .filter(t => t.name.matches(".*__v\\d+$"))
      .groupBy(_.name.replaceAll("__v\\d+$", ""))
      .toSeq.sortBy(_._1)
      .map { case (base, vs) =>
        val nums = vs.map(_.name.replaceAll(".*__v", "").toInt).sorted
        val state = graft.sources.Bucketing.peekCurrentVersion(spark, base) match {
          case Some(cur) =>
            val orphans = nums.filter(_ > cur)
            s"v$cur (${nums.size} on disk" +
              (if (orphans.nonEmpty)
                 orphans.map("v" + _).mkString(", orphans ", ",", ")")
               else ")")
          case None => s"view missing (max v${nums.last} on disk)"
        }
        ("table_version", base, state)
      }
    val indexes = tables.collect {
      case (_, n, _) if n.endsWith("_tombstones") =>
        // a corrupt/vanished tombstone table degrades ITS row, never
        // the whole facade (the reference's INFOCLUSTER keeps
        // answering when one shard is sick — same contract here)
        ("index", n.stripSuffix("_tombstones"),
          scala.util.Try(s"tombstones=${spark.table(n).count()}")
            .getOrElse(s"error=unreadable"))
    }
    // epoch groups (the multi-table-index commit layer): current
    // generation, the members present at it, and any orphaned
    // NEWER-generation tables a crashed rebuild left behind (the next
    // rebuild sweeps them; this row is how an operator sees one in
    // between). Catalog-only, like the rest of the facade.
    val epochs = allTables.map(_.name).filter(_.endsWith("_epoch"))
      .sorted.map { ev =>
        val base = ev.stripSuffix("_epoch")
        val g = graft.sources.Bucketing.currentEpoch(spark, base)
        val gen = ("^" + java.util.regex.Pattern.quote(base) +
          "_(.+)_g(\\d+)$").r
        val parsed = allTables.map(_.name).distinct.flatMap {
          case gen(m, n) => Some((m, n.toInt))
          case _ => None
        }
        val members = parsed.filter(_._2 == g).map(_._1).sorted
        val orphans = parsed.filter(_._2 > g).sorted
        val orphanStr = if (orphans.isEmpty) ""
          else orphans.map { case (m, n) => s"${m}_g$n" }
            .mkString("; orphans: ", ",", "")
        ("epoch", base, s"g$g (members: ${members.mkString(",")}$orphanStr)")
      }
    val streams = spark.streams.active.toSeq.sortBy(_.id.toString)
      .map(q => ("stream", Option(q.name).getOrElse(q.id.toString), "active"))
    // out-of-band compactions in flight or awaiting finalize — the ops
    // surface for "a stopped loop stranded a finished background
    // write" (the stream-stop hook finalizes these; this row is how
    // an operator sees one pending in between)
    val maint = graft.sources.Bucketing.pendingTables.sorted
      .map(t => ("maintenance", t, "pending"))
    // writer leases on the warehouse: who owns each table's lock and
    // how fresh the heartbeat is — the first thing to look at when a
    // write throws the single-writer violation
    val leases = graft.sources.Bucketing.leaseInfo(spark)
      .map { case (t, d) => ("lease", t, d) }
    (engine ++ fns ++ strat ++ tables ++ versioned ++ indexes ++ epochs ++
      streams ++ maint ++ leases)
      .toDF("section", "key", "value")
  }
}
