package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality constraints (the Deequ/dbt-test shape) —
 * the acceptance gate a 100 TB ingest runs BEFORE data reaches
 * training or serving: assert the contract, get back one verdict row
 * per constraint, fail the batch on any red row. The reference
 * engine's closest analog is its per-record error channel
 * (`[results, errors]` replies); this is the set-level complement:
 * errors you can only see by looking at the whole table.
 *
 * Scale shape is the whole point of the API split:
 *  - [[rowChecks]]: ANY number of row-predicate constraints
 *    (not-null, range, accepted-values, regex, cross-column) fold
 *    into ONE scan with a single map-side-combining aggregate — a
 *    conditional count per constraint, no shuffle of data rows, no
 *    per-constraint pass. Adding a constraint is free.
 *  - [[uniqueCheck]]: key uniqueness is inherently a shuffle on the
 *    key — priced as its own job, map-side partial counts first.
 *  - [[foreignKeyCheck]]: referential integrity as a LEFT ANTI join
 *    count — the optimizer broadcasts a small parent side on its
 *    own; a fact-sized parent stays a shuffle join (correct at
 *    100×).
 * Verdict rows union into one report: (check, violations, passed).
 */
object Checks {

  /**
   * All row-level constraints in one scan: each (name, predicate)
   * contributes `count(rows violating predicate)` to a single
   * aggregate; the one output row is unpivoted to a verdict row per
   * constraint.
   */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    // aggregates under positional synthetic aliases; display names
    // enter only as struct LITERALS — arbitrary check names (quotes,
    // backticks, duplicates) never touch a parsed identifier
    val aggs = checks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"_v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(checks.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("check_name"),
          coalesce(col(s"_v$i"), lit(0L)).as("violations"))
      }: _*)).as("kv"))
      .select(col("kv.check_name").as("check_name"),
        col("kv.violations").as("violations"),
        (col("kv.violations") === 0L).as("passed"))
  }

  /**
   * Uniqueness of a (possibly composite) key: violations = rows
   * carrying a key that occurs more than once (every row of a
   * duplicated key counts — the number of rows you'd have to inspect
   * to repair).
   */
  def uniqueCheck(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(when(col("_n") > 1, col("_n")).otherwise(0L)), lit(0L))
        .as("violations"))
      .select(lit(name).as("check_name"), col("violations"),
        (col("violations") === 0L).as("passed"))

  /**
   * Referential integrity: violations = child rows whose non-null
   * foreign key has no match in the parent key set (NULL fks are
   * not orphans — that's [[rowChecks]] not-null's job).
   */
  def foreignKeyCheck(child: DataFrame, name: String, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"),
        (col("violations") === 0L).as("passed"))

  /** Union of verdict frames into one report, ordered by check name. */
  def report(parts: DataFrame*): DataFrame =
    parts.reduce(_.unionByName(_)).orderBy("check_name")

  /**
   * k-anonymity audit over a quasi-identifier combination — the
   * privacy-side companion to [[graft.operators.Curation.redact]]:
   * before a corpus ships, every row must hide in a crowd of ≥ k
   * rows sharing its quasi-identifier tuple (Sweeney's k-anonymity).
   * One keyed aggregate; output is the verdict row (rows in
   * under-k groups = the re-identification exposure) plus the
   * at-risk group census for remediation (suppress or generalize
   * those tuples). Scale shape: a groupBy on the quasi-id tuple —
   * map-side combining, uniform unless the data itself is one giant
   * tuple, in which case it is anonymous anyway.
   */
  def kAnonymity(df: DataFrame, name: String, quasiIds: Seq[String],
      k: Int): DataFrame =
    df.groupBy(quasiIds.map(col): _*).agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(when(col("_n") < k, col("_n")).otherwise(0L)), lit(0L))
        .as("violations"))
      .select(lit(name).as("check_name"), col("violations"),
        (col("violations") === 0L).as("passed"))

  /** The under-k groups themselves: (quasi-ids..., n_rows) needing suppression/generalization. */
  def kAnonymityGroups(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame =
    df.groupBy(quasiIds.map(col): _*).agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") < k)

  /**
   * l-diversity audit — k-anonymity's necessary companion
   * (Machanavajjhala et al.): a crowd of k is no cover if everyone
   * in it shares the same SENSITIVE value (the homogeneity attack).
   * Lists quasi-identifier groups whose sensitive attribute takes
   * fewer than `l` distinct values. Exact distinct-per-group — the
   * semantics require it — as one grouped aggregate over
   * (quasi-ids, sensitive) then a count per quasi-id tuple: two
   * map-side-combining shuffles, both keyed by the tuple.
   */
  def lDiversityGroups(df: DataFrame, quasiIds: Seq[String],
      sensitiveCol: String, l: Int): DataFrame =
    // NULL is a MISSING sensitive value, not a distinct one (SQL
    // count(DISTINCT) semantics): a group of {NULL, 'x'} has ONE
    // real value and must be flagged at l=2, not passed
    df.filter(col(sensitiveCol).isNotNull)
      .select((quasiIds :+ sensitiveCol).map(col): _*).distinct()
      .groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n_distinct_sensitive"))
      .filter(col("n_distinct_sensitive") < l)

  /**
   * t-closeness audit (Li et al., ICDE'07 — the third rung after
   * [[kAnonymityGroups]] and [[lDiversityGroups]]): an l-diverse
   * group still leaks when its sensitive-value DISTRIBUTION skews
   * far from the table's global one (skewness attack). For an
   * ORDERED sensitive attribute the distance is the Earth Mover's
   * Distance under the ordered ground metric:
   * EMD = (1/(m−1)) · Σ_i |Σ_{j≤i}(p_j − q_j)| over the m ordered
   * values. Flags groups with round6(EMD) > t.
   *
   * Scale: everything runs on BOUNDED count tables — the global
   * value histogram, the per-group histogram, and the (groups ×
   * values) grid the cumulative window walks; no corpus-sized sort
   * or shuffle beyond the two keyed aggregates. The window
   * accumulates p and q in the same sv order on every engine, so the
   * replayed doubles are bit-identical.
   */
  def tClosenessGroups(df: DataFrame, quasiIds: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(sensitiveCol).isNotNull)
      .select(quasiIds.map(col) :+ col(sensitiveCol).as("_sv"): _*)
    val nTotal = base.count()
    val vals = base.select("_sv").distinct()
    val m = vals.count()
    require(m >= 2, "t-closeness needs at least two sensitive values")
    val globalQ = base.groupBy("_sv")
      .agg((count(lit(1)) / lit(nTotal.toDouble)).as("_q"))
    val groups = base.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("_n"))
    val cellCnt = base.groupBy(quasiIds.map(col) :+ col("_sv"): _*)
      .agg(count(lit(1)).as("_c"))
    val grid = groups.crossJoin(broadcast(vals))
      .join(cellCnt, quasiIds :+ "_sv", "left_outer")
      .join(broadcast(globalQ), "_sv")
      .withColumn("_p", coalesce(col("_c"), lit(0L)) / col("_n"))
    val w = Window.partitionBy(quasiIds.map(col): _*).orderBy("_sv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("_cp", sum("_p").over(w))
      .withColumn("_cq", sum("_q").over(w))
      .groupBy(quasiIds.map(col) :+ col("_n").as("n_rows"): _*)
      .agg(round(sum(abs(col("_cp") - col("_cq"))) / lit((m - 1).toDouble), 6)
        .as("emd"))
      .filter(col("emd") > t)
  }
}
