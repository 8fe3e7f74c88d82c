package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Round-5 continuation operators: paragraph-level dedup-rewrite,
 * sorted-neighborhood ER blocking, declarative data-quality checks.
 */
class ChecksAndRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------------- paragraphs

  private lazy val paraDocs = Seq(
    // doc 0: three 3-token units, all unique
    (0L, "a b c d e f g h i"),
    // doc 1: its middle unit "d e f" is a copy of doc 0's second unit
    (1L, "x y z d e f q r s"),
    // doc 2: entirely a copy of doc 0 → nothing survives
    (2L, "a b c d e f g h i"),
    // doc 3: unique, with a short tail unit
    (3L, "m n o p")
  ).toDF("doc_id", "text")

  test("paragraphDedup is the identity on a corpus with no repeated units") {
    val unique = Seq((0L, "a b c d e"), (1L, "f g h i j")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(unique, width = 3).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("text_kept")).toSeq === Seq("a b c d e", "f g h i j"))
    assert(out.forall(r => r.getAs[Long]("n_kept") === r.getAs[Long]("n_paras")))
  }

  test("paragraphDedup keeps first occurrence, rewrites later docs, empties full copies") {
    val out = Dedup.paragraphDedup(paraDocs, width = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_paras"),
        r.getAs[Long]("n_kept"), r.getAs[String]("text_kept")))
    assert(out(0) === ((0L, 3L, 3L, "a b c d e f g h i"))) // first occurrence: untouched
    assert(out(1) === ((1L, 3L, 2L, "x y z q r s")))       // shared middle unit removed
    assert(out(2) === ((2L, 3L, 0L, "")))                  // full copy: empty rewrite
    assert(out(3) === ((3L, 2L, 2L, "m n o p")))           // short tail unit preserved
  }

  test("paragraphDedup drops a unit repeated WITHIN one document") {
    val d = Seq((7L, "a b c a b c x y z")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(d, width = 3).collect().head
    assert(out.getAs[Long]("n_kept") === 2L)
    assert(out.getAs[String]("text_kept") === "a b c x y z")
  }

  // ---------------------------------------------------- sorted neighborhood ER

  test("sortedNeighborhoodPairs finds adjacent near-matches and respects the window") {
    val items = Seq(
      (1L, "alpha particle"), (2L, "alpha particlx"),   // levenshtein 1, sort-adjacent
      (3L, "beta decay"), (4L, "gamma ray"),
      (5L, "zeta function"), (6L, "zeta functiom")      // levenshtein 1
    ).toDF("id", "s")
    val pairs = Dedup.sortedNeighborhoodPairs(items, "s", "id", w = 3, maxDist = 2)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("dist"))).toSet
    assert(pairs.contains((1L, 2L, 1L)))
    // pairs are emitted in sequence order: "zeta functiom" sorts
    // before "zeta function", so 6 is the left element
    assert(pairs.contains((6L, 5L, 1L)))
    // nothing beyond edit distance 2 sneaks in
    assert(pairs.forall(_._3 <= 2L))
  }

  test("sortedNeighborhoodPairs matches a brute-force replay of the SNM definition") {
    val items = (1 to 60).map(i => (i.toLong, s"rec ${"%03d".format(i / 2 * 2)}")).toDF("id", "s")
    val got = Dedup.sortedNeighborhoodPairs(items, "s", "id", w = 4, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: rank in (s, id) order, all pairs within window 4, dist <= 2
    val seq0 = items.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, s) => (s, id) }.zipWithIndex
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) => if (j == 0) i else if (i == 0) j else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      ((ai, as), ar) <- seq0; ((bi, bs), br) <- seq0
      if br > ar && br - ar < 4 && lev(as, bs) <= 2
    } yield (ai, bi)).toSet
    assert(got === want)
  }

  // ------------------------------------------------------------------- checks

  private lazy val people = Seq(
    (1L, Some(10L), "A", 5.0),
    (2L, Some(20L), "B", -1.0),   // range violation
    (3L, None, "A", 2.0),         // null dept
    (4L, Some(99L), "Z", 3.0),    // orphan dept + bad status
    (4L, Some(10L), "B", 4.0)     // duplicate id
  ).toDF("id", "dept", "status", "score")
  private lazy val depts = Seq((10L, "eng"), (20L, "ops")).toDF("d_id", "d_name")

  test("tClosenessGroups flags a distribution-skewed group, passes a representative one") {
    // global: values 0 and 1 each ~half. Group "skew" holds ONLY 1s
    // (EMD = |0.5 - 0| / 1 = 0.5); group "fair" mirrors the global
    // mix (EMD = 0). Both groups are 2-diverse-or-better in spirit —
    // the skew leaks anyway, which is exactly t-closeness's point.
    val rows =
      (1 to 10).map(i => ("skew", 1L, i.toLong)) ++
      (1 to 5).map(i => ("fair", 0L, 100L + i)) ++
      (1 to 5).map(i => ("fair", 1L, 200L + i)) ++
      (1 to 10).map(i => ("bulk", 0L, 300L + i))
    val df = rows.toDF("grp", "sv", "id")
    val flagged = graft.operators.Checks
      .tClosenessGroups(df, Seq("grp"), "sv", t = 0.3)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("emd")).toMap
    assert(flagged.contains("skew"), s"skewed group not flagged: $flagged")
    assert(!flagged.contains("fair"), s"representative group wrongly flagged: $flagged")
    assert(math.abs(flagged("skew") - 0.5) < 1e-9)
  }

  test("rowChecks folds all row constraints into one pass with per-check verdicts") {
    val out = Checks.rowChecks(people, Seq(
      "dept_not_null" -> col("dept").isNotNull,
      "score_nonneg" -> (col("score") >= 0),
      "status_accepted" -> col("status").isin("A", "B")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("dept_not_null") === ((1L, false)))
    assert(out("score_nonneg") === ((1L, false)))
    assert(out("status_accepted") === ((1L, false)))
  }

  test("rowChecks passes on a clean table and a null predicate counts as violation") {
    val clean = Checks.rowChecks(people.filter(col("id") === 1L),
      Seq("score_nonneg" -> (col("score") >= 0))).collect().head
    assert(clean.getBoolean(2))
    // predicate NULL (null dept compared) → violation, not a silent pass
    val nullPred = Checks.rowChecks(people,
      Seq("dept_positive" -> (col("dept") > 0))).collect().head
    assert(nullPred.getLong(1) === 1L) // the None row
  }

  test("uniqueCheck counts every row of a duplicated key") {
    val out = Checks.uniqueCheck(people, "id_unique", Seq("id")).collect().head
    assert(out.getLong(1) === 2L)     // both id=4 rows
    assert(!out.getBoolean(2))
    val ok = Checks.uniqueCheck(people.filter(col("id") < 4), "id_unique", Seq("id"))
      .collect().head
    assert(ok.getBoolean(2))
  }

  test("foreignKeyCheck counts orphans, ignores null fks") {
    val out = Checks.foreignKeyCheck(people, "dept_fk", "dept", depts, "d_id").collect().head
    assert(out.getLong(1) === 1L)     // dept=99; the None row is not an orphan
    assert(!out.getBoolean(2))
  }

  test("kAnonymity: violations = rows in under-k groups; census lists exactly those groups") {
    val rows = Seq(
      ("us", "A"), ("us", "A"), ("us", "A"),    // group of 3 — safe at k=3
      ("fr", "B"), ("fr", "B"),                 // group of 2 — at risk
      ("de", "C")                               // singleton — at risk
    ).toDF("country", "segment")
    val verdict = Checks.kAnonymity(rows, "qid_k3", Seq("country", "segment"), k = 3)
      .collect().head
    assert(verdict.getLong(1) === 3L) // 2 + 1 exposed rows
    assert(!verdict.getBoolean(2))
    val groups = Checks.kAnonymityGroups(rows, Seq("country", "segment"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(groups === Set(("fr", "B", 2L), ("de", "C", 1L)))
    val clean = Checks.kAnonymity(rows, "qid_k1", Seq("country", "segment"), k = 1)
      .collect().head
    assert(clean.getBoolean(2)) // every group has >= 1 member by definition
  }

  test("lDiversityGroups: NULL sensitive values are missing, not distinct") {
    val rows = Seq(
      ("us", Some("cancer")), ("us", None),      // one REAL value + a null
      ("fr", Some("flu")), ("fr", Some("cold"))  // genuinely diverse
    ).toDF("country", "diag")
    val flagged = Checks.lDiversityGroups(rows, Seq("country"), "diag", l = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(flagged === Set(("us", 1L)),
      "a {NULL, x} group has ONE real sensitive value and must be flagged at l=2")
  }

  test("rowChecks: names with quotes/backticks/duplicates are data, not parsed SQL") {
    val out = Checks.rowChecks(people, Seq(
      "can't be `null`" -> col("dept").isNotNull,
      "dup" -> (col("score") >= 0),
      "dup" -> (col("score") <= 100)))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.map(_._1).toSet === Set("can't be `null`", "dup"))
    assert(out.length === 3)
  }

  test("report unions verdicts ordered by check name") {
    val rep = Checks.report(
      Checks.rowChecks(people, Seq("score_nonneg" -> (col("score") >= 0))),
      Checks.uniqueCheck(people, "id_unique", Seq("id")),
      Checks.foreignKeyCheck(people, "dept_fk", "dept", depts, "d_id"))
    val names = rep.collect().map(_.getString(0)).toSeq
    assert(names === names.sorted)
    assert(names.toSet === Set("score_nonneg", "id_unique", "dept_fk"))
  }
}
