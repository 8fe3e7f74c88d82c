package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StringType

import graft.sources.Bucketing

/**
 * Automatic manifest-segment pruning: rewrites a `Filter` over a
 * manifest version table (external parquet partitioned by the segment
 * column, carrying `graft.min/max.{col}` zone stats on its partitions
 * — [[graft.sources.Bucketing]]) so that range predicates on a
 * stats-tracked column prune to the intersecting segments *in the
 * plan*, with no API change: `spark.table(t).filter(...)` and plain
 * SQL get the skipping [[Bucketing.readSegmentsPruned]] offers
 * explicitly. This is the optimizer-rule analog of what Iceberg/Delta
 * do inside their scan builders, expressed Catalyst-first: the rule
 * only ANDs a `_graft_seg IN (...)` conjunct onto the filter — a
 * partition predicate Spark's own machinery (PruneFileSourcePartitions
 * at compile time, CatalogFileIndex partition listing at scan time)
 * turns into skipped segments. Because the injected predicate is
 * implied by the user's own range (a segment whose [min,max] cannot
 * intersect the range holds no matching rows), the rewrite never
 * changes results — and the user predicate still re-applies row-level.
 *
 * Extraction is deliberately conservative: top-level conjuncts of a
 * deterministic condition, bare column `=`/`<`/`<=`/`>`/`>=`/`IN`
 * against foldable literals (either side). Literal bounds serialize
 * through the SAME `CAST(x AS STRING)` under the session time zone
 * that the stats writer used, so values compare in the writer's
 * encoding (numeric columns as decimals, everything else
 * lexicographically — correct for the string/date/ISO-timestamp
 * types zone stats target; keep `spark.sql.session.timeZone` constant
 * between writers and readers, as the engine's own sessions pin UTC).
 *
 * At 100 TB this is the difference between a time-keyed report query
 * scanning every segment of a long-lived ingest table and scanning
 * the handful its range touches: the decision costs one catalog
 * partition listing (no FS I/O) at plan time, and segment skipping
 * composes with parquet row-group min/max inside surviving segments.
 *
 * Registration: `spark.sql.extensions=graft.GraftExtensions`
 * (optimizer-rule injection — runs pre scan-planning, so pruned
 * stats also feed join-strategy/AQE decisions) or
 * [[SegmentPrune.ensure]] on a live session (user-provided-optimizer
 * batch — scan-time partition pruning, same files skipped).
 */
case class SegmentPruneRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: LogicalRelation) =>
      tryPrune(cond, rel)
        .map(in => Filter(And(cond, in), rel)).getOrElse(f)
    // ColumnPruning interposes a bare column-pruning Project (which
    // drops the segment column) between filter and relation in the
    // operator-optimization batch; the segment predicate then goes
    // BELOW the project, where the segment attribute is in scope
    case f @ Filter(cond, p @ Project(projList, rel: LogicalRelation))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      tryPrune(cond, rel)
        .map(in => Filter(cond, Project(projList, Filter(in, rel))))
        .getOrElse(f)
  }

  /** The surviving-segment `IN` predicate a filter condition implies
    * over `rel`'s manifest, `None` when nothing is skippable (or the
    * relation/condition is out of scope). */
  private def tryPrune(cond: Expression,
      rel: LogicalRelation): Option[Expression] = {
    val meta = rel.catalogTable.getOrElse(return None)
    if (meta.partitionColumnNames != Seq(Bucketing.segColName)) return None
    val statsCols = Bucketing.statsColsOf(meta)
    if (statsCols.isEmpty) return None
    // the manifest lookup below resolves by bare name in the session's
    // current database — skip (never misread a same-named table) when
    // the relation lives elsewhere
    if (!meta.identifier.database.forall(_ == spark.catalog.currentDatabase))
      return None
    if (!cond.deterministic) return None
    val segAttr = rel.output.find(_.name == Bucketing.segColName)
      .getOrElse(return None)
    // a condition already constraining the segment column is either
    // this rule's own injection (fixpoint guard) or the user's business
    if (cond.references.contains(segAttr)) return None
    val conjuncts = splitConjunctivePredicates(cond)
    val bounds = statsCols.flatMap { c =>
      rel.output.find(a => conf.resolver(a.name, c)).flatMap { attr =>
        boundsFor(attr, conjuncts).map { case (lo, hi) => (c, lo, hi) }
      }
    }
    if (bounds.isEmpty) return None
    val (kept, total) =
      Bucketing.pruneSegNamesForPhys(spark, meta.identifier.table, bounds)
    if (kept.size >= total) return None // nothing skippable: plan unchanged
    // an empty survivor set still goes through partition pruning (a
    // name no segment carries), keeping the scan's schema/layout intact
    val names = if (kept.isEmpty) Seq(Literal("__graft_no_seg__"))
      else kept.toSeq.sorted.map(Literal(_))
    Some(In(segAttr, names))
  }

  /** Inclusive string-encoded [lower, upper] bounds the conjuncts
    * impose on `attr`, `None` when no conjunct constrains it. Strict
    * comparisons reuse their bound inclusively — pruning only needs a
    * superset. */
  private def boundsFor(attr: Attribute, conjuncts: Seq[Expression])
      : Option[(Option[String], Option[String])] = {
    var lo: Option[String] = None
    var hi: Option[String] = None
    def isCol(e: Expression): Boolean = e match {
      case a: AttributeReference => a.semanticEquals(attr)
      case _ => false
    }
    conjuncts.foreach {
      case EqualTo(a, l: Literal) if isCol(a) =>
        litStr(l).foreach { v => lo = lo.orElse(Some(v)); hi = hi.orElse(Some(v)) }
      case EqualTo(l: Literal, a) if isCol(a) =>
        litStr(l).foreach { v => lo = lo.orElse(Some(v)); hi = hi.orElse(Some(v)) }
      case GreaterThan(a, l: Literal) if isCol(a) => lo = lo.orElse(litStr(l))
      case GreaterThanOrEqual(a, l: Literal) if isCol(a) => lo = lo.orElse(litStr(l))
      case LessThan(a, l: Literal) if isCol(a) => hi = hi.orElse(litStr(l))
      case LessThanOrEqual(a, l: Literal) if isCol(a) => hi = hi.orElse(litStr(l))
      case GreaterThan(l: Literal, a) if isCol(a) => hi = hi.orElse(litStr(l))
      case GreaterThanOrEqual(l: Literal, a) if isCol(a) => hi = hi.orElse(litStr(l))
      case LessThan(l: Literal, a) if isCol(a) => lo = lo.orElse(litStr(l))
      case LessThanOrEqual(l: Literal, a) if isCol(a) => lo = lo.orElse(litStr(l))
      case In(a, vs) if isCol(a) && vs.nonEmpty &&
          vs.forall(_.isInstanceOf[Literal]) =>
        val strs = vs.map(v => litStr(v.asInstanceOf[Literal]))
        if (strs.forall(_.isDefined)) {
          val numeric = attr.dataType
            .isInstanceOf[org.apache.spark.sql.types.NumericType]
          val ord: Ordering[String] =
            if (numeric) Ordering.by((s: String) => new java.math.BigDecimal(s))
            else Ordering.String
          lo = lo.orElse(Some(strs.map(_.get).min(ord)))
          hi = hi.orElse(Some(strs.map(_.get).max(ord)))
        }
      case _ => ()
    }
    if (lo.isEmpty && hi.isEmpty) None else Some((lo, hi))
  }

  /** The literal in the stats encoding: `CAST(x AS STRING)` under the
    * session time zone — the cast the stats writer's min/max observer
    * ran. Null literals yield no bound. */
  private def litStr(l: Literal): Option[String] =
    if (l.value == null) None
    else Option(Cast(l, StringType, Some(conf.sessionLocalTimeZone))
      .eval(null)).map(_.toString)
}

object SegmentPrune {
  /** Arm the rule on a live session (idempotent) — the code-path
    * analog of `spark.sql.extensions=graft.GraftExtensions`. Lands in
    * the user-provided-optimizer batch: scan-time partition listing
    * still skips the pruned segments. */
  def ensure(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[SegmentPruneRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SegmentPruneRule(spark)
  }
}
