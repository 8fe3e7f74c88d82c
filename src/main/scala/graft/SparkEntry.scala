package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.operators.{AsOfJoin, BloomJoin, Checks, Curation, Dedup, Graph, Multimodal, Retrieval, Similarity, SkewJoin, Sketches, TextAnalysis}
import graft.pipeline.{ExecutionBuilder, MRRecord, Remote}
import graft.streaming.EventStreams

/**
 * Driver contract (SURVEY.md §7): one entry per implemented operator
 * from SURVEY §2, each with a DuckDB oracle where the semantics are
 * ANSI-SQL-expressible (hash-based sketches and approximate ops are
 * rows-only).
 *
 * Naming convention: `lmr_*` = reference pipeline-parity queries
 * (SURVEY §2.1-2.3), `q_*` = relational gap-table operators (SURVEY
 * §2.4), `dedup_*`/`ann_*`/`text_*`/`multimodal_*`/`stream_*` =
 * north-star LLM-pipeline operators.
 *
 * Oracle-compatibility rules used throughout (driver hashes values
 * after sorting columns by name):
 *  - every computed integer column is cast to BIGINT on both sides
 *    (DuckDB len()/count() are BIGINT; Spark size()/rank() are INT);
 *  - every computed double is round()ed identically on both sides;
 *  - raw `ts` values are never emitted (parquet is ns, Spark
 *    truncates to µs) — only date_trunc'd derivatives.
 */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------------
  // Pipeline-parity queries (SURVEY §2.1-2.3) — built on the typed
  // ExecutionBuilder facade (reader → map/filter/accumulate/reshuffle/collect).
  // ---------------------------------------------------------------------------

  /** `lmrtest.countkeys` analog: partial count per shard, collect, final sum. */
  private def lmrCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keys = t(s, dir, "lineitem").select($"l_orderkey").as[Long]
    ExecutionBuilder.reader(keys)
      .accumulate(0L)((acc, _) => acc + 1L)  // per-partition partial (shard-local)
      .collect()                             // gather to initiator
      .accumulate(0L)((acc, n) => acc + n)   // final global sum
      .toDF.withColumnRenamed("value", "cnt")
  }

  /** `readallstringkeys` analog: filter by type, map to a key string. */
  private def lmrFilterMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus").as[(Long, String)]
    ExecutionBuilder.reader(orders)
      .filter(_._2 == "O")
      .map(r => "order:" + r._1)
      .toDF.withColumnRenamed("value", "key")
  }

  /** `replacekeysvalues` analog: read→filter→map→reshuffle→map→collect ETL. */
  private def lmrReshuffleEtl(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
      .as[(Long, String, String)]
    implicit val byKey: MRRecord[(String, String)] = MRRecord(_._1)
    ExecutionBuilder.reader(orders)
      .filter(_._2 == "O")
      .map(r => ("order:" + r._1, r._3.toUpperCase))
      .reshuffle()                            // co-locate by CRC16 slot of key
      .map(kv => (kv._1, kv._2 + "!"))        // per-slot write-back stage
      .collect()
      .toDataset.toDF("key", "value")
  }

  /** `lmrtest.dbsize` analog: per-shard size via RunOnAllShards, summed. */
  private def lmrDbsize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer").select($"c_custkey").as[Long]
    val perShard = Remote.runOnAllShards(cust)(it => it.size.toLong)
      .getOrElse(Seq.empty)
    s.createDataset(Seq(perShard.sum)).toDF("dbsize")
  }

  /**
   * InternalCommand primitive (reference src/mr.c:1160-1220; test
   * module tests/mr_test_module/src/lib.rs:930-954): N named commands
   * broadcast to all shards, one deterministic reply per shard per
   * command, gathered as the full shard×command matrix — the oracle
   * checks every shard answered every command with the right value.
   * One command captures a value read from the data dir (the region
   * count) so the dispatch is coupled to real table state, as the
   * reference's internal commands report per-shard server state.
   */
  private def qInternalCommand(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nRegions = t(s, dir, "region").count()
    val commands: Seq[Int => String] = Seq(
      shard => s"shard-$shard:pong",
      shard => ((shard * 31 + 7) % 16384).toString,
      shard => ((shard + 1) * nRegions).toString)
    val replies = Remote.internalCommand(s, numShards = 8)(commands)
      .getOrElse(Seq.empty)
    val rows = replies.zipWithIndex.flatMap { case (perShard, shard) =>
      perShard.zipWithIndex.map { case (reply, cmd) =>
        (shard.toLong, cmd.toLong, reply)
      }
    }
    s.createDataset(rows).toDF("shard", "cmd", "reply")
  }

  /**
   * Error-channel semantics (pytests/test_errors.py): every record
   * errors in the map step; the execution still completes with
   * [0 results, N errors].
   */
  private def lmrErrorChannel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders").select($"o_orderkey").as[Long]
    val res = ExecutionBuilder.reader(orders)
      .map[Long](k => throw new IllegalStateException("injected error for key " + k))
      .collect()
      .run()
    s.createDataset(Seq((res.results.size.toLong, res.errors.size.toLong)))
      .toDF("n_results", "n_errors")
  }

  // ---------------------------------------------------------------------------
  // Relational surface (SURVEY §2.4 gap table, exposed via Spark built-ins)
  // ---------------------------------------------------------------------------

  private def q1Pricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count("*").as("count_order"))

  private def q3TopkRevenue(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count("*").as("n_items"))
  }

  /**
   * TPC-H Q7 (volume shipping), hand-shaped for scale: the 2-nation
   * filter is applied to supplier and customer BEFORE the fact joins
   * (Catalyst cannot split the cross-pair OR across both sides), so
   * lineitem shrinks ~2/25 ahead of the orders shuffle; the final
   * supp≠cust predicate removes the two same-nation pairs. Nation-
   * filtered supplier broadcasts; orders/customer joins stay
   * shuffle joins (they do not fit an executor at 100 TB — AQE
   * converts them at small SF).
   */
  private def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val nat = t(s, dir, "nation").filter(col("n_name").isin("NATION_3", "NATION_7"))
    val sup = t(s, dir, "supplier")
      .join(broadcast(nat.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = t(s, dir, "customer")
      .join(broadcast(nat.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
      .select(col("c_custkey"), col("cust_nation"))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate").between("1996-01-01", "1997-12-31"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  /**
   * TPC-H Q8 (national market share): NATION_3's share of EUROPE's
   * ECONOMY-part import volume per order year. Part/region/nation
   * prefilters broadcast into the fact side before the orders and
   * customer shuffles; the share divides the two ROUNDED sums so the
   * oracle's division replays exactly.
   */
  private def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
      .select("p_partkey")
    val euroNations = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cnk"))
    val cust = t(s, dir, "customer")
      .join(broadcast(euroNations), col("c_nationkey") === col("cnk"))
      .select("c_custkey")
    val sup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val vol = t(s, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate").between("1996-01-01", "1997-12-31")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"),
        col("supp_nation"))
    vol.groupBy("o_year")
      .agg(
        round(sum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(lit(0.0))), 2).as("nation_volume"),
        round(sum(col("volume")), 2).as("total_volume"))
      .select(col("o_year"), col("nation_volume"), col("total_volume"),
        round(col("nation_volume") / col("total_volume"), 4).as("mkt_share"))
  }

  /**
   * TPC-H Q10 (returned-item reporting): top-20 customers by revenue
   * lost to returns in 1996 H1. Returnflag + date filters push to the
   * scans, nation broadcasts, and the final top-20 lowers to
   * TakeOrderedAndProject (revenue DESC, custkey tiebreak) — no
   * global sort ever materializes.
   */
  private def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate").between("1996-01-01", "1996-06-30"))
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /**
   * TPC-H Q12 flavor (shipping-priority audit; the fixture has no
   * shipmode/receiptdate, so lateness = shipped >90 days after the
   * order): high- vs low-priority late/on-time lineitem counts.
   */
  private def q12LateShipments(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
          .otherwise("low").as("priority_class"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > 90).as("late"))
      .groupBy("priority_class", "late")
      .agg(count(lit(1)).as("n_items"))
  }

  /**
   * TPC-H Q14 (promotion effect): PROMO-part share of monthly revenue
   * in 1996; part broadcasts into the filtered fact scan, and the
   * share divides the two ROUNDED sums (the q8 discipline).
   */
  private def q14PromoShare(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate").between("1996-01-01", "1996-12-31"))
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_type"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("mon"))
      .agg(
        round(sum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0.0))), 2).as("promo_revenue"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_revenue"))
      .select(col("mon"), col("promo_revenue"), col("total_revenue"),
        round(col("promo_revenue") / col("total_revenue"), 4).as("promo_share"))
  }

  /**
   * TPC-H Q4 (order-priority checking; the fixture has no commit/
   * receipt dates, so "late" = a lineitem shipped >60 days after the
   * order date): per-priority counts of Q1'96 orders with at least
   * one late item. The EXISTS lowers to one left-semi shuffle join
   * whose condition carries the cross-table date predicate; the date
   * filter on orders pushes to its scan.
   */
  private def q4PriorityCheck(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate").between("1996-01-01", "1996-03-31"))
    val l = t(s, dir, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        datediff(l("l_shipdate"), o("o_orderdate")) > 60, "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /**
   * TPC-H Q6 (forecasting-revenue change): the pure scan-side query —
   * all three predicates and both columns push into the parquet scan,
   * one partial-aggregated row per partition reaches the driver.
   */
  private def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate").between("1996-01-01", "1996-12-31") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  /**
   * TPC-H Q13 (customer order-count distribution): customer LEFT
   * OUTER orders (excluding 5-LOW priority — the comment-filter
   * analog), per-customer order counts, then the count histogram.
   * The outer join and first aggregation share the custkey exchange.
   */
  private def q13OrderDistribution(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "5-LOW")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /**
   * TPC-H Q15 (top supplier): Q1'96 revenue per supplier, then the
   * supplier(s) achieving the max. Revenue rounds to 2 decimals
   * BEFORE the max compare so both engines pick identical winners;
   * the 1-row max and the winners broadcast into the supplier join.
   */
  private def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate").between("1996-01-01", "1996-03-31"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
    val winners = rev.join(broadcast(mx), col("total_revenue") === col("max_rev"))
    t(s, dir, "supplier")
      .join(broadcast(winners), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /**
   * TPC-H Q17 (small-quantity-order revenue): yearly revenue lost if
   * below-20%-of-average-quantity orders of one brand's parts were no
   * longer filled. The brand prefilter broadcasts into both lineitem
   * passes (~1/25 of parts), and the per-part quantity averages —
   * exact: quantities are integer-valued doubles, so the sums are
   * order-independent — broadcast into the final filter.
   */
  private def q17SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").filter(col("p_brand") === "Brand#3")
      .select("p_partkey")
    val l = t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val lim = l.groupBy(col("l_partkey").as("lp"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_limit"))
    l.join(broadcast(lim), col("l_partkey") === col("lp"))
      .filter(col("l_quantity") < col("qty_limit"))
      .agg(count(lit(1)).as("n_items"),
        round(round(sum(col("l_extendedprice")), 2) / 7.0, 2).as("avg_yearly"))
  }

  /**
   * TPC-H Q18 (large-volume customers): orders whose total quantity
   * exceeds 300, top-100. The HAVING aggregate runs on lineitem alone
   * (map-side combine on orderkey), and only the ~0.1% surviving
   * orders join orders/customer; quantity sums are integer-exact so
   * the threshold and ordering replay bit-identically.
   */
  private def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 300)
    big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), round(col("o_totalprice"), 2).as("total_price"),
        col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /**
   * TPC-H Q19 (discounted-revenue, disjunctive predicates): revenue
   * over an OR of three (brand, size-range, quantity-range) conjunct
   * groups. Each side's subsuming prefilter is applied explicitly
   * before the join — Catalyst cannot split an OR spanning both
   * sides — so the broadcast hash join probes only candidate rows
   * and re-checks the exact disjunction as its residual condition.
   */
  private def q19BrandPromo(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").filter(
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 10)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 30)))
    val l = t(s, dir, "lineitem").filter(col("l_quantity").between(1, 30))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey") && (
        (p("p_brand") === "Brand#1" && p("p_size").between(1, 10) &&
          l("l_quantity").between(1, 11)) ||
        (p("p_brand") === "Brand#2" && p("p_size").between(1, 20) &&
          l("l_quantity").between(10, 20)) ||
        (p("p_brand") === "Brand#3" && p("p_size").between(1, 30) &&
          l("l_quantity").between(20, 30))))
      .agg(round(sum(l("l_extendedprice") * (lit(1) - l("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /**
   * TPC-H Q22 (global-sales-opportunity; every fixture customer has
   * orders, so "never ordered" becomes "inactive since 2000"):
   * above-average-balance customers with no recent orders, by nation.
   * The positive-balance average is a 1-row broadcast scalar, rounded
   * to 6 decimals before the compare (the round6 discipline); the
   * NOT EXISTS is a left-anti join against the date-filtered orders
   * scan — orders shrinks before the shuffle.
   */
  private def q22IdleCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(round(avg(col("c_acctbal")), 6).as("avg_bal"))
    val recent = t(s, dir, "orders").filter(col("o_orderdate") >= "2000-01-01")
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
  }

  /**
   * TPC-H Q21 (suppliers who kept orders waiting, adapted: lateness =
   * shipped >90 days after the order date): per supplier, finished
   * multi-supplier orders where THEY were late and no co-supplier
   * was. The double-correlated EXISTS/NOT EXISTS lower to a left-semi
   * and a left-anti self-join of lineitem on the orderkey — all three
   * lineitem sides shuffle on the same key (one exchange family, AQE
   * reuses it) and only (orderkey, suppkey[, shipdate]) projections
   * ever move; the supplier name join broadcasts.
   */
  private def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    val late = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 90)
      .select(col("l_orderkey").as("lo"), col("l_suppkey").as("ls"),
        col("o_orderdate").as("od"))
    val others = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"),
        col("l_shipdate").as("d2"))
    val l1 = late
      .join(others, col("lo") === col("o2") && col("ls") =!= col("s2"), "left_semi")
      .join(others,
        col("lo") === col("o2") && col("ls") =!= col("s2") &&
          datediff(col("d2"), col("od")) > 90, "left_anti")
    l1.join(broadcast(t(s, dir, "supplier")), col("ls") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /**
   * Derived PARTSUPP: the fixture ships no partsupp table, so the
   * five partsupp TPC-H shapes (Q2/Q9/Q11/Q16/Q20) build it
   * DETERMINISTICALLY from part × supplier with dbgen's
   * supplier-assignment formula — each part's 4 candidate suppliers
   * step by floor(S/4) + floor((p−1)/S) around the supplier ring —
   * and integer-valued availqty/supplycost attributes (hash-free
   * modular arithmetic, so float sums are EXACT and order-free).
   * Both engines derive the SAME rows from the same fixture parquet,
   * so the DuckDB oracle stays a true independent replay; DISTINCT
   * absorbs the small-S step-wraparound collisions (step ≡ 0 mod S
   * folds the 4 candidates together — possible at fixture S, never
   * at dbgen's S ≥ 10k).
   */
  private def partsuppDerived(s: SparkSession, dir: String): DataFrame = {
    val scnt = t(s, dir, "supplier").agg(count(lit(1)).as("s_cnt"))
    val quarters = s.range(0, 4).toDF("i")
    t(s, dir, "part").select(col("p_partkey"))
      .crossJoin(broadcast(quarters))
      .crossJoin(broadcast(scnt))
      .withColumn("step",
        floor(col("s_cnt") / 4) + floor((col("p_partkey") - 1) / col("s_cnt")))
      .select(col("p_partkey").as("ps_partkey"),
        (pmod(col("p_partkey") + col("i") * col("step"), col("s_cnt")) + 1)
          .cast("long").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty",
        pmod(col("ps_partkey") * 37 + col("ps_suppkey") * 43, lit(9999L)) + 1)
      .withColumn("ps_supplycost",
        (pmod(col("ps_partkey") * 53 + col("ps_suppkey") * 61, lit(920L)) + 1)
          .cast("double"))
  }

  /**
   * TPC-H Q2 (minimum-cost supplier, fixture-adapted predicates):
   * for each LARGE-type part, the EUROPE supplier(s) offering it
   * at the minimum derived supply cost — the classic correlated-min
   * subquery decorrelated into a per-part min aggregate joined back.
   * All dimension sides broadcast; the only shuffle is partsupp's
   * per-part min. Full tie-break ordering so the LIMIT cut is
   * engine-independent.
   */
  private def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part").filter(col("p_type") === "LARGE")
      .select("p_partkey", "p_brand")
    val eur = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val offers = partsuppDerived(s, dir)
      .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(eur), col("ps_suppkey") === col("s_suppkey"))
    val minCost = offers.groupBy(col("ps_partkey").as("mp"))
      .agg(min(col("ps_supplycost")).as("mc"))
    offers.join(broadcast(minCost),
        col("ps_partkey") === col("mp") && col("ps_supplycost") === col("mc"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_brand"), col("ps_supplycost").as("min_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /**
   * TPC-H Q9 (product-type profit): profit on every '%rod%' part —
   * revenue minus derived supply cost — by supplier nation and order
   * year. The part prefilter broadcasts into lineitem; partsupp
   * attaches by its (partkey, suppkey) key; one (nation, year)
   * aggregate. Sum rounds to 2dp on both engines (the q5/q8 float
   * discipline).
   */
  private def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val rods = t(s, dir, "part").filter(col("p_name").like("%rod%"))
      .select("p_partkey")
    val ps = partsuppDerived(s, dir)
    t(s, dir, "lineitem")
      .join(broadcast(rods), col("l_partkey") === col("p_partkey"))
      .join(ps, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("ps_supplycost") * col("l_quantity")), 2).as("sum_profit"))
  }

  /**
   * TPC-H Q11 (important stock): parts whose NATION_3 stock value
   * (supplycost × availqty) exceeds 0.1% of that nation's total —
   * the group-by-HAVING-global-subquery shape. Stock values are
   * integer-valued doubles, so both sums and the threshold compare
   * are EXACT on both engines; the 1-row total broadcasts.
   */
  private def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val natSupp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val scoped = partsuppDerived(s, dir)
      .join(broadcast(natSupp), col("ps_suppkey") === col("s_suppkey"))
      .withColumn("value", col("ps_supplycost") * col("ps_availqty"))
    val total = scoped.agg(sum(col("value")).as("tot"))
    scoped.groupBy(col("ps_partkey"))
      .agg(sum(col("value")).as("part_value"))
      .crossJoin(broadcast(total))
      .filter(col("part_value") > col("tot") * 0.001)
      .select(col("ps_partkey"), round(col("part_value"), 2).as("stock_value"))
  }

  /**
   * TPC-H Q16 (parts/supplier relationship): distinct supplier count
   * per (brand, type, size) over the derived partsupp, excluding one
   * brand, one type, off-list sizes, and negative-balance suppliers
   * (the fixture's stand-in for the complaint-comment NOT IN — same
   * anti-join shape).
   */
  private def q16PartsSupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 9, 15))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSupp = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("ps_suppkey"))
    partsuppDerived(s, dir)
      .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), Seq("ps_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
  }

  /**
   * TPC-H Q20 (potential part promotion): EUROPE suppliers whose
   * derived stock of a 'blue%' part exceeds half of what they
   * shipped of it in 1996 — the nested EXISTS/IN chain as semi-join
   * + per-(part, supplier) shipped aggregate. Quantities are
   * integer-valued, so the half-threshold compare is exact.
   */
  private def q20StockedPromoSuppliers(s: SparkSession, dir: String): DataFrame = {
    val blue = t(s, dir, "part").filter(col("p_name").like("blue%"))
      .select("p_partkey")
    val shipped = t(s, dir, "lineitem")
      .filter(col("l_shipdate").between("1996-01-01", "1996-12-31"))
      .join(broadcast(blue), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val qualified = partsuppDerived(s, dir)
      .join(shipped, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") > col("qty") * 0.5)
      .select(col("ps_suppkey")).distinct()
    t(s, dir, "supplier")
      .join(qualified, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_name"), col("n_name"))
  }

  private def qWindowLatestOrders(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"),
        round(col("o_totalprice"), 2).as("total"))
  }

  private def qRollup(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count("*").as("n_customers"), round(sum("c_acctbal"), 2).as("sum_bal"))
  }

  private def qIntersect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
      .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct())

  private def qExcept(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
      .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct())

  private def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count("*").as("n_customers_no_orders"))
  }

  private def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count("*").as("n_orders"))
  }

  private def qScalarFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      length(col("p_name")).cast("long").as("name_len"),
      round(col("p_retailprice") * 1.1, 2).as("inflated"),
      substring(col("p_type"), 1, 5).as("type5"),
      concat_ws("#", col("p_brand"), col("p_type")).as("tag"),
      abs(col("p_size") - 25).cast("long").as("size_dev"))

  private def qDateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(year(col("l_shipdate")).cast("long").as("y"),
        month(col("l_shipdate")).cast("long").as("m"))
      .agg(count("*").as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))

  private def qDistinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(countDistinct("l_partkey").as("n_parts"),
        count("*").as("n_items"),
        round(avg("l_discount"), 4).as("avg_disc"))

  /**
   * HLL++ sketch with a self-validating assertion: the sketch value
   * itself is engine-specific, so the oracled contract is "within 5%
   * of exact" (deterministic — same data, same sketch, same bound).
   */
  private def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey").as("approx_parts"),
        countDistinct("l_partkey").as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <= col("exact_parts") * 0.05)
          .as("approx_ok"))

  private def qEventsWindow(s: SparkSession, dir: String): DataFrame =
    EventStreams.windowedCounts(t(s, dir, "events"))

  private def qSessionize(s: SparkSession, dir: String): DataFrame =
    EventStreams.sessionCounts(t(s, dir, "events"))

  /**
   * Slowly-changing-dimension TYPE 2 build from an event log: each
   * user's event_type transitions become versioned validity intervals
   * ([valid_from, valid_to), open interval = current) — the warehouse
   * history-table pattern, derived with two per-user windows (change
   * detection by lag, interval close by lead). One hash exchange on
   * user_id; per-user sort only (users are bounded, the log is not —
   * the window never sees more than one user's rows). Timestamps are
   * compared and emitted at ms precision on both engines (the fixture
   * is ns parquet; Spark floors ns→µs→ms, DuckDB ns→ms — identical
   * floors).
   */
  private def qScd2(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
    val w = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
    val changes = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val w2 = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
    changes
      .withColumn("version", row_number().over(w2).cast("long"))
      .withColumn("valid_to_ms", lead(col("ms"), 1).over(w2))
      .select(col("user_id"), col("version"), col("event_type").as("state"),
        col("ms").as("valid_from_ms"), col("valid_to_ms"),
        col("valid_to_ms").isNull.as("is_current"))
  }

  /**
   * POINT-IN-TIME dimension lookup — the consuming side of SCD2: each
   * purchase joins the dimension version valid AT its event time.
   * Because a key's versions partition time, the interval join
   * collapses to a backward as-of against the version starts — the
   * custom [[graft.operators.AsOfJoin]], one hash exchange on the
   * key, |facts|+|versions| rows total, never an interval-explosion
   * range join. The oracle proves the interval semantics directly
   * (BETWEEN valid_from AND valid_to with the open current interval).
   */
  private def qDimLookup(s: SparkSession, dir: String): DataFrame = {
    // dimension = the user's BROWSING state (non-purchase transitions);
    // facts = purchases looked up against it — "purchases by current
    // context". Purchases before a user's first tracked state → 'none'.
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"), col("value"))
    val track = ev.filter(col("event_type") =!= "purchase")
    val w = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
    val dim = track
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(col("user_id").as("d_user"), col("ms").as("valid_from_ms"),
        col("event_type").as("state"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms"), col("value"))
    AsOfJoin.asofBackward(purchases, dim, "user_id", "d_user", "ms", "valid_from_ms")
      .groupBy(coalesce(col("state"), lit("none")).as("state"))
      .agg(count(lit(1)).as("n_purchases"), round(sum("value"), 2).as("sum_value"))
  }

  /**
   * Last-touch attribution: each purchase credits the user's latest
   * preceding view/click/signup (or 'none'), via the custom
   * [[graft.operators.AsOfJoin]] — one hash exchange on user_id plus a
   * per-key window sort, |P|+|T| rows total, never a range explosion.
   * The oracle replays it with DuckDB's native ASOF LEFT JOIN.
   */
  private def qAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val touches = ev.filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id").as("t_user"), col("ts").as("t_ts"),
        col("event_type").as("touch_type"))
    AsOfJoin.asofBackward(purchases, touches, "user_id", "t_user", "ts", "t_ts")
      .groupBy(coalesce(col("touch_type"), lit("none")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum("value"), 2).as("attributed_value"))
  }

  /**
   * Cohort retention matrix: users grouped by first-seen day, activity
   * counted per (cohort, day-offset). The activity frame is distinct
   * on (user, day) BEFORE the cohort join, so each group's active-user
   * count is a plain count(*) — no count-distinct Expand; both the
   * first-seen agg and the join shuffle on user_id (one exchange
   * reused), and the per-cohort size table (≤ days rows) broadcasts.
   */
  private def qEventCohorts(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val firstSeen = ev.groupBy("user_id")
      .agg(date_trunc("day", min("ts")).as("cohort_day"))
    val active = ev.select(col("user_id"),
      date_trunc("day", col("ts")).as("day")).distinct()
    val sizes = firstSeen.groupBy("cohort_day").agg(count(lit(1)).as("cohort_users"))
    active.join(firstSeen, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("active_users"),
        round(col("active_users") / col("cohort_users"), 4).as("retention"))
  }

  /** Stream-stream-joinable click→purchase attribution (batch twin; streaming in StreamingSpec). */
  private def qClickToPurchase(s: SparkSession, dir: String): DataFrame =
    EventStreams.clickToPurchaseStats(t(s, dir, "events"))

  /**
   * The Spark 4 `transformWithState` StatefulProcessor run as a BATCH
   * query (the new arbitrary-state API executes on batch frames too —
   * one pass, state discarded): per-user event stats ≡ groupBy agg.
   * The streaming run of the same processor converges to these rows
   * (StreamingSpec).
   */
  private def qUserStatsTws(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Stateful.runningUserStats(t(s, dir, "events")).toDF()

  /**
   * Batch twin of the stream-stream LEFT OUTER join
   * ([[EventStreams.clickToPurchaseOuter]]): per user, attribution
   * rows and the unconverted-click count (null purchase side).
   */
  private def qStreamUnconverted(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    EventStreams.clickToPurchaseOuter(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("p_ts").isNull, 1)).as("n_unconverted"))
  }

  /** Streaming volume-anomaly batch twin: |z| >= 2 windows per event type. */
  private def qStreamZscore(s: SparkSession, dir: String): DataFrame =
    EventStreams.zscoreReport(EventStreams.windowedCounts(t(s, dir, "events"))
      .select(col("win_start"), col("event_type"), col("n")))

  /** Streaming leaderboard batch twin: per-hour top-3 users on the custom heap operator. */
  private def qStreamTopk(s: SparkSession, dir: String): DataFrame =
    EventStreams.topUsersPerWindow(EventStreams.windowUserCounts(t(s, dir, "events")))

  /**
   * Batch twin of the streaming CMS: count-min estimates vs exact
   * counts for the 10 busiest users. StreamingSpec proves the
   * micro-batch-merged sketch (cells summed across batches) equals
   * this single-shot sketch cell-for-cell — the mergeable-summary
   * pattern for approximate frequency over an unbounded stream.
   */
  private def qStreamCms(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.cmsEstimates(
        Tables.events(s, dir).select(col("user_id")), "user_id", topK = 10)
      .select(col("k").cast("long").as("user_id"), col("exact"), col("est"))

  /**
   * Batch twin of the streaming KMV distinct counter: per event type,
   * distinct users exactly and by the mergeable bottom-256 sketch —
   * [[graft.operators.Sketches.kmvDistinctByKey]]; StreamingSpec
   * proves sketches merged across real micro-batches equal this.
   */
  private def qStreamKmv(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.kmvDistinctByKey(
      Tables.events(s, dir).select(col("event_type"), col("user_id")),
      "event_type", "user_id")

  private def qStreamSessions(s: SparkSession, dir: String): DataFrame =
    EventStreams.streamingSessions(t(s, dir, "events"))
      .select(col("user_id"), date_trunc("second", col("session_start")).as("session_start"),
        col("n_events"))

  private def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count("*").as("n"), sum("k").as("sum_k"), round(avg("k"), 4).as("avg_k"))

  private def qOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .groupBy(coalesce(col("c_mktsegment"), lit("NO_CUSTOMER")).as("segment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
  }

  private def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count("*").as("n"), round(sum("o_totalprice"), 2).as("sum_price"))

  private def qStringMatch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_name").like("%a%") && col("p_type").rlike("[MN]"))
      .groupBy("p_brand")
      .agg(count("*").as("n"))

  private def qDateArith(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .withColumn("delay_days", datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .groupBy(col("o_orderstatus"))
      .agg(round(avg("delay_days"), 4).as("avg_delay"),
        max("delay_days").as("max_delay"), count("*").as("n"))
  }

  /** As-of join (merge-based union+window — one shuffle, no range blowup). */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select("event_id", "user_id", "ts")
    // right side unique per (key, time): keep max orderkey
    val ord = t(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max("o_orderkey").as("o_orderkey"))
    AsOfJoin.asofBackward(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("o_orderkey"))
  }

  private def qPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("median"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))

  /** KLL-style sketch percentile with an oracled within-2% assertion (see qApproxDistinct). */
  private def qPercentileApprox(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx_median"),
        expr("percentile(o_totalprice, 0.5)").as("exact_median"))
      .select(col("o_orderstatus"), round(col("exact_median"), 2).as("median"),
        (abs(col("approx_median") - col("exact_median")) <= abs(col("exact_median")) * 0.02)
          .as("approx_ok"))

  private def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .count()
      .na.fill(0L)

  /** Deterministic content-hash sampling (reproducible across engines/cluster sizes). */
  private def qSampleHash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(substring(md5(col("c_custkey").cast("string")), 1, 1) === "0")
      .select(col("c_custkey"), col("c_mktsegment"))

  private def qRankVariants(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
    t(s, dir, "part")
      .select(col("p_brand"), col("p_partkey"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"),
        round(lag(col("p_retailprice"), 1).over(w), 2).as("prev_price"))
      .filter(col("rn") <= 3)
  }

  private def qCorrStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
        round(stddev_samp(col("l_discount")), 4).as("disc_stddev"),
        round(var_samp(col("l_tax")), 4).as("tax_var"),
        count("*").as("n"))

  private def qConditionalAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("n_discounted"),
        round(sum(when(col("l_returnflag") === "R", col("l_extendedprice"))
          .otherwise(lit(0.0))), 2).as("returned_value"),
        round(avg(when(col("l_quantity") > 25, col("l_quantity"))), 4).as("avg_large_qty"))

  /** Custom two-phase heap operator (LogicalPlan+Strategy+Exec): top-3 orders per status. */
  private def qTopkCustom(s: SparkSession, dir: String): DataFrame =
    graft.relational.Relational.topKPerKey(
      t(s, dir, "orders"),
      keys = Seq(col("o_orderstatus")),
      order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3)
      .select(col("o_orderstatus"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("total"))

  /** Custom DSv2 source (KeysReader analog): slot-range partitions + prefix pushdown. */
  private def qKeysSource(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-keys")
      .option("numKeys", 2000).option("shards", 8).load()
      .filter(col("key").startsWith("user:"))   // consumed by the scan
      .select(col("key"), col("payload"))

  /**
   * Shard-RPC aggregate fold through the DSv2 source: MIN/MAX/COUNT
   * push into the scan together — each slot-range partition replies
   * ONE partial row (no keys materialize) and Spark merges the shard
   * replies, the reference's initiator-side accumulate over per-shard
   * RPC results generalized past count.
   */
  private def qKeysMinmax(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-keys")
      .option("numKeys", 2000).option("shards", 8).load()
      .groupBy()
      .agg(min("key").as("min_key"), max("key").as("max_key"),
        count(lit(1)).as("n"))

  /**
   * GROUPED shard-RPC fold through the DSv2 source: per-slot
   * COUNT/MIN push into the scan itself (the reference's per-shard
   * KEYED fold, src/mr.c:2263-2311, generalized past the ungrouped
   * dbsize) — each slot-range partition replies one partial row per
   * slot it owns, no key rows materialize, and Spark's final
   * aggregate merges the shard replies. The slot cast happens ABOVE
   * the aggregate so the pushed group key stays the raw column.
   */
  private def qKeysGroupcount(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-keys")
      .option("numKeys", 2000).option("shards", 8).load()
      .groupBy("slot")
      .agg(count(lit(1)).as("n"), min("key").as("min_key"))
      .select(col("slot").cast("long").as("slot"), col("n"), col("min_key"))

  /**
   * REAL image pipeline, two codec stages chained: encode
   * deterministic PNGs → decode→nearest-neighbor-resample→re-encode
   * ([[Multimodal.resizeImages]], factor 2) → decode back. The
   * oracle replays the RESIZED truth without any codec: output dims
   * are ⌈w/2⌉×⌈h/2⌉ and output pixel (x, y) is the closed-form source
   * pixel (2x, 2y).
   */
  private def multimodalResizeReal(s: SparkSession, dir: String): DataFrame = {
    val withBin = t(s, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        Multimodal.encodePng(col("doc_id"),
          (col("doc_id") % 8 + 1).cast("int"),
          (col("doc_id") % 5 + 1).cast("int")).as("payload"))
    Multimodal.decodeImages(Multimodal.resizeImages(withBin, factor = 2))
  }

  /**
   * Pixel-level perceptual hash on REAL decoded images: encode
   * deterministic 24×16 PNGs, decode, block-mean hash the pixel grid
   * ([[Multimodal.imagePhash]]) — the oracle rebuilds all 64 bits
   * from the closed-form pixels with the identical integer compare
   * (s_b·N > total·n_b), no codec needed.
   */
  private def multimodalImagePhash(s: SparkSession, dir: String): DataFrame = {
    val withBin = t(s, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        Multimodal.encodePng(col("doc_id"), lit(24), lit(16)).as("payload"))
    Multimodal.imagePhash(withBin)
  }

  /** GROUPING SETS via the SQL surface (Spark parser + Catalyst Expand). */
  private def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer")
    t(s, dir, "nation").createOrReplaceTempView("nation")
    t(s, dir, "region").createOrReplaceTempView("region")
    s.sql(
      """SELECT r_name, n_name, count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())""".stripMargin)
  }

  /** Correlated EXISTS + scalar subquery via the SQL surface. */
  private def qSubqueries(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer")
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_mktsegment, count(*) AS n_rich_active
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin)
  }

  /** Custom typed Aggregator (LibMR `accumulate` analog) as a registered UDAF. */
  private def qUdafWeighted(s: SparkSession, dir: String): DataFrame = {
    val wmean = udaf(graft.functions.Aggregators.WeightedMean)
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(wmean(col("l_extendedprice"), col("l_quantity")), 4).as("wavg_price"),
        count("*").as("n"))
  }

  private def qArrayAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("priorities"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))

  /** Running (cumulative) revenue per returnflag by ship month — window prefix sum. */
  private def qCumulative(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"),
        year(col("l_shipdate")).cast("long").as("y"),
        month(col("l_shipdate")).cast("long").as("m"))
      .agg(sum("l_extendedprice").as("rev"))
    val w = Window.partitionBy("l_returnflag").orderBy("y", "m")
      .rowsBetween(Window.unboundedPreceding, 0)
    monthly
      .withColumn("cum_rev", round(sum("rev").over(w), 2))
      .select(col("l_returnflag"), col("y"), col("m"), round(col("rev"), 2).as("rev"),
        col("cum_rev"))
  }

  /**
   * Range(band) join: events bucketed into value bands via a BETWEEN
   * join against a tiny broadcast band table (the scalable shape for
   * small range dimensions — a band per row, broadcast NLJ).
   */
  private def qRangeBand(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(10).toDF("band")
      .select(col("band"), (col("band") * 20.0).as("lo"), ((col("band") + 1) * 20.0).as("hi"))
    t(s, dir, "events")
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band")
      .agg(count("*").as("n"), round(avg("value"), 4).as("avg_value"))
  }

  /** UNION ALL + global ORDER BY + OFFSET/LIMIT paging. */
  private def qUnionPaging(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_name").as("name"), lit("customer").as("kind"))
      .unionAll(t(s, dir, "supplier").select(col("s_name").as("name"), lit("supplier").as("kind")))
      .orderBy(col("name"), col("kind"))
      .offset(20)
      .limit(20)

  /**
   * Redis-slot partitioning demo: CRC16 slot histogram (custom
   * codegen'd expression). Oracled: the DuckDB side folds the same
   * CRC16-CCITT table with `list_reduce` over the key's bytes.
   */
  private def qCrc16Slots(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(crc16_slot(concat(lit("cust:"), col("c_custkey"))).as("slot"))
      .groupBy((col("slot") % 32).cast("long").as("bucket"))
      .agg(count("*").as("n"))

  // --- new in round 2: relational surface widening ---------------------------

  /** UDTF shape: explode token arrays, re-aggregate (lateral-view analog). */
  private def qExplodeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("tok"))
      .groupBy("tok")
      .agg(count("*").as("n"))
      .filter(col("n") > 1)

  /** Distribution window functions: ntile / percent_rank / cume_dist (top decile only). */
  private def qNtileCume(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        ntile(10).over(w).cast("long").as("decile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .filter(col("decile") === 10)
  }

  /** min_by / max_by aggregates over a unique ordering key (first/last event type per user). */
  private def qMinmaxBy(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id")
      .agg(
        min_by(col("event_type"), col("event_id")).as("first_type"),
        max_by(col("event_type"), col("event_id")).as("last_type"),
        min("event_id").as("first_event"),
        max("event_id").as("last_event"))

  /** Regexp group extraction: split '1-URGENT' style priorities into components. */
  private def qRegexpExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        regexp_extract(col("o_orderpriority"), "^(\\d)-", 1).as("prio_num"),
        regexp_extract(col("o_orderpriority"), "-(.+)$", 1).as("prio_word"))
      .agg(count("*").as("n"))

  /** Higher-order array functions: transform / filter / aggregate over per-row arrays. */
  private def qArrayLambda(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_size").cast("long").as("sz"),
        aggregate(transform(sequence(lit(1L), col("p_size").cast("long")), x => x * x),
          lit(0L), (acc, x) => acc + x).as("sum_sq"),
        size(filter(sequence(lit(1L), col("p_size").cast("long")), x => x % 2 === 0))
          .cast("long").as("n_even"))

  /** Map functions: build per-user event-type→count map, inspect keys + lookups. */
  private def qMapFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id", "event_type").agg(count("*").as("cnt"))
      .groupBy("user_id")
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt")))).as("m"))
      .select(col("user_id"),
        array_join(array_sort(map_keys(col("m"))), ",").as("types"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("n_clicks"),
        size(map_keys(col("m"))).cast("long").as("n_types"))

  /** Value-based (RANGE INTERVAL) window frame: 7-day trailing revenue per priority. */
  private def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderpriority, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 2) AS wk_sum
        |FROM orders""".stripMargin)
  }

  /** `MR_RunOnKey` parity as a query: keyed point lookup through the remote-task facade. */
  private def qPointLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_acctbal").as[(Long, String, Double)]
    val rows = Remote.runOnKey(cust, (r: (Long, String, Double)) => r._1 == 42L)(
      it => it.toSeq).getOrElse(Seq.empty)
    s.createDataset(rows).toDF("c_custkey", "c_name", "c_acctbal")
      .withColumn("c_acctbal", round(col("c_acctbal"), 2))
  }

  /** Salted skew join (explicit hot-key spreading) — result ≡ the plain inner join. */
  private def qSkewSalted(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"), col("value"))
    val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    SkewJoin.saltedInnerJoin(ev, cust, "user_id", "c_custkey", saltFactor = 8)
      .groupBy("c_mktsegment")
      .agg(count("*").as("n"), round(sum("value"), 2).as("sum_value"))
  }

  /**
   * Bloom-pre-filtered selective fact⋈dim join (operators.BloomJoin):
   * fact rows that can't match are dropped in the scan stage, before
   * the join shuffle; the exact join clears false positives, so the
   * result ≡ the plain join and the oracle is the plain join SQL.
   */
  private def qBloomJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"), col("value"))
    val dim = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_nationkey"))
    BloomJoin.preFilteredJoin(ev, dim, "user_id", "c_custkey")
      .groupBy("c_nationkey")
      .agg(count("*").as("n"), round(sum("value"), 2).as("sum_value"))
  }

  /** Time-series gap fill: dense month × status grid via sequence(), zeros for missing. */
  private def qGapFill(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val m = o.groupBy(date_trunc("month", col("o_orderdate")).as("mon"),
      col("o_orderstatus")).agg(count("*").as("n"))
    val months = o.agg(date_trunc("month", min("o_orderdate")).as("lo"),
        date_trunc("month", max("o_orderdate")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 month"))).as("mon"))
    val statuses = o.select("o_orderstatus").distinct()
    months.crossJoin(broadcast(statuses))
      .join(m, Seq("mon", "o_orderstatus"), "left")
      .na.fill(0L, Seq("n"))
      .select(col("o_orderstatus"), col("mon"), col("n"))
  }

  /** Fixed-width numeric histogram (floor-bucketing — width_bucket portable form). */
  private def qHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      .agg(count("*").as("n"), round(avg("o_totalprice"), 2).as("avg_price"))

  /** Bitwise aggregates. */
  private def qBitwiseAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("bit_and(l_linenumber)").cast("long").as("and_ln"),
        expr("bit_or(l_linenumber)").cast("long").as("or_ln"),
        expr("bit_xor(l_orderkey % 256)").cast("long").as("xor_ok"))

  /** Streaming-dedup batch twin: duplicated input, exact-once output (drop by event id). */
  private def qStreamDedup(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    ev.unionAll(ev)
      .dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count("*").as("n"))
  }

  /** Spark 4 VARIANT type: parse once, typed paths extracted downstream. */
  private def qVariant(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
      .groupBy("event_type")
      .agg(count("*").as("n"), sum("k").as("sum_k"), max("k").as("max_k"))

  /** Correlated LATERAL subquery (per-customer order rollup in one pass of the outer). */
  private def qLateral(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer")
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey, n_orders, total_spent
        |FROM customer, LATERAL (
        |  SELECT count(*) AS n_orders,
        |         round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
        |  FROM orders WHERE o_custkey = c_custkey)""".stripMargin)
  }

  /** UNPIVOT (wide metrics → long): the melt shape. */
  private def qUnpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("qty"),
        round(sum("l_extendedprice"), 2).as("price"),
        round(sum("l_discount"), 2).as("disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("qty"), col("price"), col("disc")), "metric", "value")

  /** Stable scratch dir per (format, fixture) for source/sink round-trips. */
  private def rtPath(dir: String, fmt: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_rt_${fmt}_${math.abs(dir.hashCode)}"

  /** CSV sink → CSV source round-trip (explicit schema reapplied on read). */
  private def qCsvRoundtrip(s: SparkSession, dir: String): DataFrame =
    graft.sources.FileIO.roundTrip(t(s, dir, "supplier"), "csv", rtPath(dir, "csv"))
      .groupBy("s_nationkey")
      .agg(count("*").as("n"), round(sum("s_acctbal"), 2).as("bal"))

  /** ORC sink → ORC source round-trip (columnar alternative to parquet, schema-carrying). */
  private def qOrcRoundtrip(s: SparkSession, dir: String): DataFrame =
    graft.sources.FileIO.roundTrip(t(s, dir, "part"), "orc", rtPath(dir, "orc"))
      .groupBy("p_brand")
      .agg(count("*").as("n"), round(sum("p_retailprice"), 2).as("price"))

  /**
   * SCHEMA EVOLUTION round-trip: a dataset written in two generations
   * — the second adding a column the first never had (the 100 TB
   * reality: files accumulate for years, schemas drift) — read back
   * with parquet schema merging. Old files surface the new column as
   * NULL; aggregates must treat both generations uniformly. The
   * oracle replays the generation split and the NULL semantics.
   */
  private def qSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val path = rtPath(dir, "evo")
    val cust = t(s, dir, "customer")
    val gen1 = cust.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_nationkey"))
    val gen2 = cust.filter(col("c_custkey") % 2 =!= 0)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("acctbal")) // the evolved column
    gen1.write.mode("overwrite").parquet(s"$path/gen=1")
    gen2.write.mode("overwrite").parquet(s"$path/gen=2")
    s.read.option("mergeSchema", "true").parquet(s"$path/gen=1", s"$path/gen=2")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_total"),
        count(col("acctbal")).as("n_with_balance"),
        round(sum(coalesce(col("acctbal"), lit(0.0))), 2).as("sum_balance"))
  }

  /**
   * Bucketed co-located join (sources.Bucketing): both sides written
   * bucketed by the join key, so the (sort-merge-pinned) join runs
   * with no exchange on either input — the write-once, join-forever
   * layout for 100 TB recurring joins. Result ≡ the plain join.
   */
  private def qBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val suf = math.abs(dir.hashCode).toString
    val (ordT, custT) = (s"g_ord_b_$suf", s"g_cust_b_$suf")
    graft.sources.Bucketing.writeBucketed(
      t(s, dir, "orders").select(col("o_custkey"), col("o_totalprice")),
      ordT, "o_custkey", 8)
    graft.sources.Bucketing.writeBucketed(
      t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
      custT, "c_custkey", 8)
    graft.sources.Bucketing.bucketedJoin(s, ordT, custT, "o_custkey", "c_custkey")
      .groupBy("c_mktsegment")
      .agg(count("*").as("n"), round(sum("o_totalprice"), 2).as("revenue"))
  }

  /**
   * Manifest zone-stat segment pruning (sources.Bucketing): orders
   * lands as three date-clustered segments — a base write plus two
   * appends, the natural layout of time-keyed ingest — each recording
   * min/max `o_orderdate` in the manifest at registration. The
   * one-month query then reads ONLY the intersecting segment(s),
   * judged from catalog metadata with zero data I/O for cold history
   * (the Iceberg/Delta manifest-stats discipline, carried on the
   * segment partitions). Result ≡ the plain filter over orders; the
   * segment-count pin lives in ManifestStatsSpec.
   */
  private def qSegmentPruned(s: SparkSession, dir: String): DataFrame = {
    val tn = s"g_segstats_${math.abs(dir.hashCode)}"
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_totalprice"))
    graft.sources.Bucketing.writeBucketed(
      o.filter(col("o_orderdate") < "1997-01-01"), tn, "o_custkey", 4,
      statsCols = Seq("o_orderdate"))
    graft.sources.Bucketing.appendBucketed(
      o.filter(col("o_orderdate") >= "1997-01-01" &&
        col("o_orderdate") < "1999-01-01"), tn, "o_custkey")
    graft.sources.Bucketing.appendBucketed(
      o.filter(col("o_orderdate") >= "1999-01-01"), tn, "o_custkey")
    // prune bounds pad to day granularity (timestamps serialize with a
    // time part, and pruning must stay a superset); the exact
    // predicate re-applies below
    graft.sources.Bucketing.readSegmentsPruned(s, tn, "o_orderdate",
        Some("1996-06-01"), Some("1996-07-01"))
      .filter(col("o_orderdate").between("1996-06-01", "1996-06-30"))
      .groupBy("o_orderdate")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
  }

  /**
   * The AUTOMATIC form of [[qSegmentPruned]]: same date-clustered
   * three-segment layout, but the query is a PLAIN
   * `spark.table(t).filter(range)` — no pruning API in sight. The
   * injected optimizer rule ([[graft.plans.SegmentPruneRule]], armed
   * via [[GraftExtensions]]) reads the range off the filter, consults
   * the manifest's zone stats, and ANDs the surviving-segment
   * partition predicate into the plan, so Spark's own partition
   * pruning skips cold history — what `spark.sql.extensions` buys
   * every query against a stats-tracked table. Segment-count pins
   * live in SegmentPruneSpec; here the oracle pins results unchanged.
   */
  private def qSegmentPrunedAuto(s: SparkSession, dir: String): DataFrame = {
    graft.plans.SegmentPrune.ensure(s)
    val tn = s"g_segauto_${math.abs(dir.hashCode)}"
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_totalprice"))
    graft.sources.Bucketing.writeBucketed(
      o.filter(col("o_orderdate") < "1997-01-01"), tn, "o_custkey", 4,
      statsCols = Seq("o_orderdate"))
    graft.sources.Bucketing.appendBucketed(
      o.filter(col("o_orderdate") >= "1997-01-01" &&
        col("o_orderdate") < "1999-01-01"), tn, "o_custkey")
    graft.sources.Bucketing.appendBucketed(
      o.filter(col("o_orderdate") >= "1999-01-01"), tn, "o_custkey")
    s.table(tn)
      .filter(col("o_orderdate").between("1996-06-01", "1996-06-30"))
      .groupBy("o_orderdate")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
  }

  /**
   * Time travel on the version layer (sources.Bucketing): orders lands
   * as a base write (< 1997) then an append (≥ 1997); the query reads
   * the table AS OF an instant between the two — which must equal the
   * filtered subset exactly. The as-of read resolves at APPEND
   * granularity: each segment's registration instant rides its
   * manifest entry (carried by reference through rewrites), so history
   * costs metadata + unique segments, never copies. The
   * `graceVersions`/`vacuumRetainMs` knobs are the retention policy;
   * reads outside it throw rather than answer wrong (TimeTravelSpec).
   */
  private def qTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val tn = s"g_timetravel_${math.abs(dir.hashCode)}"
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_totalprice"))
    graft.sources.Bucketing.writeBucketed(
      o.filter(col("o_orderdate") < "1997-01-01"), tn, "o_custkey", 4)
    Thread.sleep(5)
    val asOf = System.currentTimeMillis()
    Thread.sleep(5)
    graft.sources.Bucketing.appendBucketed(
      o.filter(col("o_orderdate") >= "1997-01-01"), tn, "o_custkey")
    graft.sources.Bucketing.readAsOf(s, tn, asOf)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
  }

  /**
   * The append feed (sources.Bucketing.segmentFeed): a consumer polls
   * the base write (taking its watermark), two appends land, and the
   * next poll must deliver EXACTLY the appended rows — each ingested
   * segment exactly once, keyed by strictly-monotonic registration
   * stamps, maintenance segments never fed. Pull-based CDC with one
   * catalog listing per poll; the retention knobs bound how far a
   * consumer may lag (SegmentFeedSpec pins the merge interactions).
   */
  private def qSegmentFeed(s: SparkSession, dir: String): DataFrame = {
    val tn = s"g_segfeed_${math.abs(dir.hashCode)}"
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_totalprice"))
    graft.sources.Bucketing.writeBucketed(
      o.filter(col("o_orderdate") < "1997-01-01"), tn, "o_custkey", 4)
    val (_, w) = graft.sources.Bucketing.segmentFeed(s, tn, 0L)
    graft.sources.Bucketing.appendBucketed(
      o.filter(col("o_orderdate") >= "1997-01-01" &&
        col("o_orderdate") < "1999-01-01"), tn, "o_custkey")
    graft.sources.Bucketing.appendBucketed(
      o.filter(col("o_orderdate") >= "1999-01-01"), tn, "o_custkey")
    val (segs, _) = graft.sources.Bucketing.segmentFeed(s, tn, w)
    graft.sources.Bucketing.readSegments(s, tn, segs)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
  }

  /**
   * Incremental corpus dedup: the last 10% of docs arrive as a "new
   * batch"; find their near-dups in the standing corpus without
   * re-pairing the corpus (Dedup.incrementalNearDupPairs — batch
   * shingles broadcast; the corpus is one scan).
   */
  /**
   * The bloom seen-before gate on the 90/10 ingest split: summary of
   * the batch with the bloom's structural guarantees as assertion
   * columns — `no_false_negatives` (an exact duplicate is NEVER waved
   * through) must be true by construction, and `gate_effective` holds
   * unless false positives exceed 10× the configured fpp. Exact
   * counts are the oracle-replayable part; the bloom-dependent pass
   * count stays internal (it varies with the sketch).
   */
  private def dedupBloomGate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cut = (docs.agg(max("doc_id")).head.getLong(0) + 1L) * 9L / 10L
    val corpus = docs.filter(col("doc_id") < cut)
    val batch = docs.filter(col("doc_id") >= cut)
    val gated = BloomJoin.seenGate(batch, corpus, expectedItems = 10000L)
    val corpusTexts = corpus.select(col("text").as("t2")).distinct()
    gated.join(corpusTexts, gated("text") === col("t2"), "left_outer")
      .select(col("maybe_seen"), col("t2").isNotNull.as("is_dup"))
      .agg(count(lit(1)).as("n_batch"),
        count(when(col("is_dup"), 1)).as("n_true_dups"),
        (count(when(!col("maybe_seen") && col("is_dup"), 1)) === 0)
          .as("no_false_negatives"),
        (count(when(col("maybe_seen") && !col("is_dup"), 1)) <=
          greatest(count(lit(1)) * 0.1, lit(5.0))).as("gate_effective"))
  }

  private def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // "new batch" = the top 10% of doc ids (a metadata-only max scan)
    val cut = (docs.agg(max("doc_id")).head.getLong(0) + 1L) * 9L / 10L
    Dedup.incrementalNearDupPairs(
      docs.filter(col("doc_id") >= cut), docs.filter(col("doc_id") < cut))
  }

  /**
   * Persistent-index continuous-ingest dedup: the corpus (doc_id <
   * cut) is indexed ONCE (MinHash bands + shingle sets, bucketed),
   * then the new batch is checked against the index with zero corpus
   * rescan. LSH recall at k=128/bands=32 makes the output equal the
   * exhaustive batch×corpus jaccard pairs — the same oracle as
   * dedup_incremental.
   */
  private def dedupIndexIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cut = (docs.agg(max("doc_id")).head.getLong(0) + 1L) * 9L / 10L
    // the index is persistent by design: build it once per session and
    // let subsequent calls (bench reps, repeated batches) measure the
    // per-batch path only — exactly the production cost model
    if (!s.catalog.tableExists("graft_dedup_idx_bands"))
      Dedup.writeMinhashIndex(docs.filter(col("doc_id") < cut), "graft_dedup_idx")
    Dedup.indexedNearDupPairs(docs.filter(col("doc_id") >= cut), "graft_dedup_idx")
  }

  /**
   * Index MAINTENANCE under continuous ingest: the corpus arrives in
   * two installments — the first 80% is indexed at build time, the
   * next 10% lands later and is APPENDED (Dedup.appendToMinhashIndex:
   * batch-sized bucketed inserts, no rebuild, no corpus rescan) —
   * and the final 10% probes the maintained index. Correct iff the
   * probe sees appended docs exactly like built ones: the result
   * equals the exhaustive batch×corpus pairs at the 90% cut, the
   * same oracle as dedup_incremental.
   */
  private def dedupIndexAppend(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val mx = docs.agg(max("doc_id")).head.getLong(0) + 1L
    val cut80 = mx * 8L / 10L
    val cut90 = mx * 9L / 10L
    if (!s.catalog.tableExists("graft_dedup_idxa_bands")) {
      Dedup.writeMinhashIndex(docs.filter(col("doc_id") < cut80), "graft_dedup_idxa")
      Dedup.appendToMinhashIndex(
        docs.filter(col("doc_id") >= cut80 && col("doc_id") < cut90),
        "graft_dedup_idxa")
    }
    Dedup.indexedNearDupPairs(docs.filter(col("doc_id") >= cut90), "graft_dedup_idxa")
  }

  /**
   * The persisted, incrementally-maintained form of the bloom
   * seen-gate: filters built from the first 80%, the next 10% merged
   * in by appendToSeenFilters (one batch pass — blooms are mergeable
   * summaries), final 10% gated from the stored bank. Summary columns
   * as in dedup_bloom_gate; `no_false_negatives` now also proves the
   * append path (a dup of an APPENDED doc must be flagged too).
   */
  private def dedupBloomPersist(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val mx = docs.agg(max("doc_id")).head.getLong(0) + 1L
    val cut80 = mx * 8L / 10L
    val cut90 = mx * 9L / 10L
    if (!s.catalog.tableExists("graft_seen_filters")) {
      BloomJoin.writeSeenFilters(docs.filter(col("doc_id") < cut80),
        "graft_seen_filters", expectedItemsPerShard = 10000L)
      BloomJoin.appendToSeenFilters(
        docs.filter(col("doc_id") >= cut80 && col("doc_id") < cut90),
        "graft_seen_filters")
    }
    val gated = BloomJoin.seenGateFromTable(
      docs.filter(col("doc_id") >= cut90), "graft_seen_filters")
    val corpusTexts = docs.filter(col("doc_id") < cut90)
      .select(col("text").as("t2")).distinct()
    gated.join(corpusTexts, gated("text") === col("t2"), "left_outer")
      .select(col("maybe_seen"), col("t2").isNotNull.as("is_dup"))
      .agg(count(lit(1)).as("n_batch"),
        count(when(col("is_dup"), 1)).as("n_true_dups"),
        (count(when(!col("maybe_seen") && col("is_dup"), 1)) === 0)
          .as("no_false_negatives"),
        (count(when(col("maybe_seen") && !col("is_dup"), 1)) <=
          greatest(count(lit(1)) * 0.1, lit(5.0))).as("gate_effective"))
  }

  /**
   * The composed INGEST DECISION — what a crawler actually runs per
   * batch, as one statement: each arriving doc gets ONE verdict with
   * fixed priority — exact duplicate of the corpus > near-duplicate
   * (jaccard ≥ 0.7 against the standing corpus) > low quality
   * (composite score < 0.5) > accepted. Exact/near flags are
   * batch-sized broadcasts onto the batch scan; quality is a
   * scan-stage column; the corpus contributes one distinct-text pass
   * and the shingle probe — nothing corpus-sized ever shuffles twice.
   */
  private def pipelineIngest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cut = (docs.agg(max("doc_id")).head.getLong(0) + 1L) * 9L / 10L
    Curation.ingestDecision(
      docs.filter(col("doc_id") >= cut), docs.filter(col("doc_id") < cut))
  }

  /**
   * Range-clustered sorted sink: orders written range-partitioned +
   * sorted on o_orderdate, re-read with a date-range predicate that
   * parquet stats satisfy by skipping files/row-groups (FileIO
   * .sortedRoundTrip). Result ≡ the filtered aggregate off the
   * fixture.
   */
  private def qSortedSink(s: SparkSession, dir: String): DataFrame =
    graft.sources.FileIO.sortedRoundTrip(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice")),
        rtPath(dir, "sorted"), "o_orderdate")
      .filter(col("o_orderdate").between("1995-01-01", "1995-03-31"))
      .groupBy(col("o_orderdate"))
      .agg(count("*").as("n"), round(sum("o_totalprice"), 2).as("sum_price"))

  /** JSON sink → JSON source round-trip (dates survive via the explicit schema). */
  private def qJsonRoundtrip(s: SparkSession, dir: String): DataFrame =
    graft.sources.FileIO.roundTrip(
        t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
        "json", rtPath(dir, "json"))
      .groupBy(year(col("o_orderdate")).cast("long").as("y"))
      .agg(count("*").as("n"), round(sum("o_totalprice"), 2).as("sum_price"))

  /**
   * Partitioned-parquet sink round-trip: hive-style `l_returnflag=R`
   * directories; the post-read equality filter is satisfied by
   * partition-directory pruning (only 1/3 of files scanned).
   */
  private def qPartitionedSink(s: SparkSession, dir: String): DataFrame =
    graft.sources.FileIO.roundTrip(
        t(s, dir, "lineitem").select("l_orderkey", "l_returnflag", "l_quantity")
          // co-locate rows with their output directory but keep write
          // parallelism: a handful of files per partition value
          // instead of (tasks × values) small files
          .repartition(8, col("l_returnflag"), col("l_orderkey")),
        "parquet", rtPath(dir, "parquet"), partitionCols = Seq("l_returnflag"))
      .filter(col("l_returnflag") === "R")
      .groupBy("l_returnflag")
      .agg(count("*").as("n"), round(sum("l_quantity"), 2).as("qty"))

  /**
   * JDBC sink → JDBC source round-trip through embedded Derby
   * (completes the §2.4 scans row: parquet/csv/json/jdbc). The JDBC
   * path is partition-parallel on read via predicates/bounds; here
   * the table is a 25-row dimension, the single-partition default.
   */
  /** Monotonic nonce for Derby scratch databases: each call gets a fresh
    * path, because a previously booted database (in this JVM or a live
    * executor JVM) holds db.lck until that JVM exits, and a jar must not
    * be rewritten while an engine has it booted. */
  private val derbyNonce = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Derby embedded engine shutdown for one database — releases db.lck so
    * ANOTHER JVM can boot it. Success is signalled by SQLException 08006,
    * per the Derby contract. */
  private def shutdownDerby(dbPath: String): Unit =
    try { java.sql.DriverManager.getConnection(s"jdbc:derby:$dbPath;shutdown=true"); () }
    catch { case _: java.sql.SQLException => () }

  /** Zip a closed Derby database directory into a jar under entry-prefix
    * `dbName/` — the layout Derby's `jdbc:derby:jar:(file)dbName`
    * read-only subprotocol boots from. */
  private def jarDerbyDb(dbDir: java.io.File, dbName: String, jarPath: String): Unit = {
    val z = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(jarPath))
    def walk(d: java.io.File, prefix: String): Unit = d.listFiles().foreach { f =>
      if (f.isDirectory) walk(f, s"$prefix${f.getName}/")
      else {
        z.putNextEntry(new java.util.zip.ZipEntry(s"$prefix${f.getName}"))
        java.nio.file.Files.copy(f.toPath, z); z.closeEntry()
      }
    }
    try walk(dbDir, s"$dbName/") finally z.close()
  }

  private def qJdbcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = System.getProperty("java.io.tmpdir")
    System.setProperty("derby.system.home", tmp)  // keep derby.log out of the repo
    // Embedded Derby allows ONE booting JVM per read-write database, and
    // Spark opens DRIVER-side connections at unpredictable points (lazy
    // schema fetch at first analysis, scan-build at physical planning —
    // both re-boot the driver engine AFTER any hand-off shutdown, caught
    // by the round-11 local-cluster Verify run). So the SCAN side reads a
    // jar-packed READ-ONLY database instead: per the Derby contract,
    // read-only jar databases are concurrently bootable by multiple JVMs,
    // which makes the executor-side partition-parallel read.jdbc path
    // work identically on local[N] and multi-process masters. Against a
    // networked RDBMS the same plan runs without the jar step.
    val pid = ProcessHandle.current().pid()
    val props = new java.util.Properties()
    val src = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    val scratch = s"$tmp/graft_derby_${pid}_${math.abs(dir.hashCode)}_${derbyNonce.incrementAndGet()}"
    if (s.sparkContext.isLocal) {
      // single-JVM master: executors share the driver's engine, so the
      // real distributed sink path (write.jdbc = executor-side
      // connections, partition-parallel against a production RDBMS) runs
      src.write.mode("overwrite").jdbc(s"jdbc:derby:$scratch;create=true", "nation_rt", props)
    } else {
      // multi-process master: write.jdbc is impossible on embedded Derby
      // by construction — Spark's save() boots the DRIVER engine
      // (tableExists/create) before the executor write tasks run, and
      // db.lck then blocks every executor boot. Write the 25-row dim
      // through one driver connection instead (bounded driver traffic).
      // A server-mode leg (Derby Network Server) would lift the
      // one-booting-JVM constraint and run the executor-parallel write
      // path here too, but the environment ships only derby/derbyshared/
      // derbytools — the DRDA server (derbynet: org.apache.derby.impl.
      // drda.*) and the network client (derbyclient: org.apache.derby.
      // client.*) jars are absent, and no other RDBMS is reachable with
      // zero egress, so embedded-only stays (VERDICT r11 #7 rationale).
      // The executor-parallel WRITE plan itself is exercised on local[N]
      // (the `if` branch above runs real write.jdbc), and the executor-
      // parallel READ path runs multi-process via the read-only jar DB.
      val rows = src.collect()
      val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$scratch;create=true")
      try {
        val st = conn.createStatement()
        st.executeUpdate(
          "CREATE TABLE nation_rt (n_nationkey BIGINT, n_name VARCHAR(64), n_regionkey BIGINT)")
        st.close()
        val ps = conn.prepareStatement("INSERT INTO nation_rt VALUES (?, ?, ?)")
        rows.foreach { r =>
          ps.setLong(1, r.getAs[Number](0).longValue()); ps.setString(2, r.getString(1))
          ps.setLong(3, r.getAs[Number](2).longValue()); ps.executeUpdate()
        }
        ps.close()
      } finally conn.close()
    }
    shutdownDerby(scratch)  // close the db cleanly before packing
    val jar = s"$scratch.jar"
    jarDerbyDb(new java.io.File(scratch), "nation_db", jar)
    // all reads go through the jar from here on: drop the scratch
    // directory NOW and the jar at JVM exit, so repeated bench/suite
    // sweeps don't accumulate unbounded scratch DBs in java.io.tmpdir
    def deleteRec(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(deleteRec)
      f.delete(); ()
    }
    deleteRec(new java.io.File(scratch))
    new java.io.File(jar).deleteOnExit()
    s.read.jdbc(s"jdbc:derby:jar:($jar)nation_db", "nation_rt", props)
      .groupBy("n_regionkey")
      .agg(count("*").as("n"), min("n_name").as("first_name"))
  }

  /** Frame sampling over binary payloads: every 4th 64-byte chunk, content-hashed. */
  private def qMultimodalFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(Multimodal.attachBinary(t(s, dir, "documents")),
        chunk = 64, stride = 4)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(col("frame")).as("frame_md5"))

  // ---------------------------------------------------------------------------
  // North-star LLM-pipeline operators
  // ---------------------------------------------------------------------------

  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDupGroups(t(s, dir, "documents"))

  private def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 5, threshold = 0.7)

  /** Asymmetric containment pairs: quotations/partial copies jaccard misses. */
  private def dedupContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramContainmentPairs(t(s, dir, "documents"), n = 5, threshold = 0.8)

  /** Near-dup clusters: connected components over the exact-jaccard pair graph. */
  private def dedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.dupClusters(Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 5, threshold = 0.7))

  /**
   * Same cluster closure forced down the DISTRIBUTED path
   * (smallGraphEdges = 0 disables the driver union-find fast lane):
   * the alternating large-star/small-star loop that holds when the
   * pair graph itself no longer fits one task. Oracled against the
   * identical recursive-CTE transitive closure as `dedup_clusters`,
   * so the two paths are pinned equal cross-engine, not just in the
   * unit suite.
   */
  private def dedupClustersBig(s: SparkSession, dir: String): DataFrame =
    Dedup.dupClusters(Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 5, threshold = 0.7),
      smallGraphEdges = 0L)

  /**
   * The cluster closure as a MAINTAINED structure
   * (Dedup.writeClusterIndex / clusterAssignIncremental): the
   * standing 90% of the corpus persists its assignment; the arriving
   * 10%'s pairs ingest incrementally — new docs adopt or found
   * clusters, bridging docs MERGE standing clusters through the
   * path-compressed relabel table. The oracle is the identical
   * global recursive-CTE closure (`dedup_clusters`'s), so maintained
   * ≡ global is pinned cross-engine over every doc.
   */
  private def dedupClustersIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cut = (docs.agg(max("doc_id")).head.getLong(0) + 1L) * 9L / 10L
    if (!s.catalog.tableExists("graft_cluster_idx")) {
      Dedup.writeClusterIndex(
        Dedup.ngramJaccardPairs(docs.filter(col("doc_id") < cut), n = 5, threshold = 0.7),
        "graft_cluster_idx")
      val batchPairs = Dedup.ngramJaccardPairs(docs, n = 5, threshold = 0.7)
        .filter(col("a_id") >= cut || col("b_id") >= cut)
      Dedup.clusterAssignIncremental(batchPairs, "graft_cluster_idx")
    }
    Dedup.clusterAssignments(s, "graft_cluster_idx")
  }

  /** The dedup decision end-to-end: corpus minus non-representative near-dups. */
  private def dedupCorpus(s: SparkSession, dir: String): DataFrame =
    Dedup.dropNearDups(t(s, dir, "documents"), n = 5, threshold = 0.7)
      .select(col("doc_id"), md5(col("text")).as("text_md5"))

  /**
   * The composed LLM training-data pipeline in one query: quality
   * gate + language gate + near-dup removal, rolled up per source —
   * every stage is the oracled operator used elsewhere, chained.
   */
  private def pipelineFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // quality and language are narrow per-row expressions — attach them as
    // columns on the deduped scan instead of joining them back by doc_id
    // (saves two shuffled joins over the full corpus).
    Dedup.dropNearDups(docs, n = 5, threshold = 0.7)
      .withColumn("quality", TextAnalysis.qualityCol(col("text")))
      .withColumn("pred_lang", TextAnalysis.predLangCol(col("text")))
      .filter(col("quality") >= 0.5 && col("pred_lang") === "en")
      .groupBy("source")
      .agg(count("*").as("n_docs"), round(avg("quality"), 4).as("avg_quality"))
  }

  /**
   * k=128/b=32 banding: a jaccard-0.7 pair misses the candidate set
   * with probability (1-0.7⁴)³² ≈ 1.5e-4, so the exact-jaccard
   * verification step makes the output equal the exhaustive
   * ngram-jaccard pairs — which is the oracle.
   */
  private def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDupPairs(t(s, dir, "documents"), k = 128, bands = 32, threshold = 0.7)

  /**
   * [[dedupMinhash]] expressed ENTIRELY in SQL through the registered
   * function surface (minhash_doc / shingle_hashes / bucket_pairs —
   * [[GraftExtensions]]): the SQL-only user's path to the flagship
   * dedup, refine-not-drop generator included, with no Scala API in
   * the loop. Same k=128/b=32 parameters ⇒ same exhaustive-jaccard
   * oracle as dedup_minhash.
   */
  /**
   * Operability facade ([[Graft.info]] — the reference's INFOCLUSTER,
   * src/cluster.c:1668-1756), restricted to its deterministic rows:
   * the slot-space size, the full registered-function census, and the
   * injected planner strategy. Catalog/stream rows depend on what a
   * shared session has run and are exercised by the spec instead.
   */
  private def qInfo(s: SparkSession, dir: String): DataFrame = {
    Graft.attach(s)
    Graft.info(s).filter(
      (col("section") === "engine" && col("key") === "slots") ||
        col("section") === "function" || col("section") === "strategy")
  }

  private def dedupMinhashSql(s: SparkSession, dir: String): DataFrame = {
    Graft.attach(s)
    t(s, dir, "documents").createOrReplaceTempView("documents_mhsql")
    s.sql(
      "WITH sigs AS (SELECT doc_id AS id, minhash_doc(text, 5, 128) AS sig " +
        "FROM documents_mhsql), " +
        "bands AS (SELECT id, xxhash64(sig) AS rk, band_idx, " +
        "xxhash64(slice(sig, band_idx * 4 + 1, 4)) AS band_hash " +
        "FROM sigs LATERAL VIEW explode(sequence(0, 31)) t AS band_idx), " +
        "buckets AS (SELECT band_idx, band_hash, " +
        "collect_list(named_struct('id', id, 'rk', rk)) AS xs " +
        "FROM bands GROUP BY band_idx, band_hash), " +
        "cand AS (SELECT DISTINCT a_id, b_id FROM buckets " +
        "LATERAL VIEW bucket_pairs(xs, 10000) p AS a_id, b_id), " +
        "sets AS (SELECT doc_id AS id, shingle_hashes(text, 5) AS sh_set " +
        "FROM documents_mhsql) " +
        "SELECT c.a_id, c.b_id, " +
        "round(size(array_intersect(a.sh_set, b.sh_set)) / " +
        "(size(a.sh_set) + size(b.sh_set) " +
        "- size(array_intersect(a.sh_set, b.sh_set))), 4) AS jaccard " +
        "FROM cand c JOIN sets a ON a.id = c.a_id JOIN sets b ON b.id = c.b_id " +
        "WHERE size(array_intersect(a.sh_set, b.sh_set)) / " +
        "(size(a.sh_set) + size(b.sh_set) " +
        "- size(array_intersect(a.sh_set, b.sh_set))) >= 0.7")
  }

  /** md5-compatible sketch (verification-grade) — DuckDB recomputes identical simhashes. */
  private def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupPairs(t(s, dir, "documents"), maxHamming = 3, md5Compat = true)

  /**
   * 16 LSH tables × 8 bits: a cos-0.95 pair (bit-agreement 0.899)
   * misses all tables with probability (1-0.899⁸)¹⁶ ≈ 1.3e-4, so the
   * exact-cosine verification makes the output equal the exhaustive
   * threshold pairs — which is the oracle.
   *
   * The synthetic embeddings are near-orthogonal (max pairwise cosine
   * ≈ 0.6 at every sf), so the fixture alone has no pairs ≥ 0.95; the
   * query plants deterministic near-dups (ids +100000, even dims
   * ×1.1 / odd ×0.9 → cos ≈ 0.995 to the source vector) so the
   * operator and its exhaustive-pair oracle are non-trivially
   * exercised.
   */
  private def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val planted = base.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * when(i % 2 === 0, 1.1).otherwise(0.9)).as("embedding"))
    Dedup.embeddingNearDupPairs(base.unionAll(planted), threshold = 0.95,
      bits = 8, tables = 16)
  }

  /**
   * SemDeDup-style semantic dedup: one deterministic k-means step
   * clusters the corpus (+ planted scaled near-dups, as in
   * dedup_embedding); near-dup pairs are within-cluster cos ≥ 0.95.
   */
  private def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val planted = base.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * when(i % 2 === 0, 1.1).otherwise(0.9)).as("embedding"))
    Similarity.semanticDedup(base.unionAll(planted), nlist = 32, threshold = 0.95)
  }

  /** Span-level exact-substring dedup report: docs sharing a verbatim 20-token window. */
  private def dedupSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.sharedSpanReport(t(s, dir, "documents"), span = 20)

  /**
   * The span-level REWRITE (Dedup.spanRewrite): every token covered
   * by a 20-token window whose content occurs earlier in (doc_id,
   * position) order is removed and the doc reassembled. The oracle
   * replays the full pipeline — positioned windows, keep-first by
   * row_number, interval coverage, ordered reassembly — on shingle
   * STRINGS (the engine hashes them; the fixture is collision-free).
   */
  /**
   * Tokenizer model-swap: the 8 iteratively-learned merges persist
   * as a parquet table and segmentation applies FROM the table
   * (TextAnalysis.bpeApplyFromTable) — retraining the tokenizer is a
   * data overwrite, not a code change. Oracle replays train (the
   * shared s0..s8 chain) AND apply (s8 IS the learned segmentation).
   */
  private def textBpeTable(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    if (!s.catalog.tableExists("graft_bpe_merges")) {
      import s.implicits._
      // writeSmallTable, not a bare saveAsTable: it clears an
      // orphaned warehouse dir a previous JVM left behind
      graft.sources.Bucketing.writeSmallTable(
        TextAnalysis.bpeTrainIterative(docs, nMerges = 8).zipWithIndex
          .map { case ((x, y, c), i) => (i + 1L, x, y, c) }
          .toDF("rank", "x", "y", "cnt"),
        "graft_bpe_merges")
    }
    TextAnalysis.bpeApplyFromTable(docs, s.table("graft_bpe_merges"))
  }

  private def dedupSpanRewrite(s: SparkSession, dir: String): DataFrame =
    Dedup.spanRewrite(t(s, dir, "documents"), span = 20)

  /**
   * Span-index DELETE, oracled: corpus docs with doc_id%7==1 are
   * tombstoned out of the built index, and the arriving batch
   * rewrites against the masked index — windows whose FIRST corpus
   * occurrence belonged to a deleted doc legitimately REVIVE (the
   * index stores one owner per hash; masking the owner masks the
   * hash — deliberately NOT rebuild-without, which would re-own).
   * The oracle replays exactly that: corpus-first ownership,
   * deletion mask, batch-first fallback, coverage, reassembly.
   */
  /**
   * Unit-index DELETE, oracled — the paragraph twin of
   * `dedup_span_rewrite_del`: owners with doc_id%7==1 tombstone out
   * and the batch rewrite revives their units (one owner per unit
   * hash; masked owner ⇒ unowned unit). Residue 1 hits two of the
   * five corpus owners the batch actually duplicates, so both the
   * revive and still-masked paths execute.
   */
  private def dedupParagraphsDel(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cut = (docs.agg(max("doc_id")).head.getLong(0) + 1L) * 9L / 10L
    if (!s.catalog.tableExists("graft_unit_idxd")) {
      Dedup.writeUnitIndex(docs.filter(col("doc_id") < cut), "graft_unit_idxd")
      Dedup.deleteFromUnitIndex(
        docs.filter(col("doc_id") < cut && col("doc_id") % 7 === 1).select("doc_id"),
        "graft_unit_idxd")
    }
    Dedup.paragraphDedupIncremental(docs.filter(col("doc_id") >= cut), "graft_unit_idxd")
  }

  private def dedupSpanRewriteDel(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cut = (docs.agg(max("doc_id")).head.getLong(0) + 1L) * 9L / 10L
    if (!s.catalog.tableExists("graft_span_idxd")) {
      Dedup.writeSpanIndex(docs.filter(col("doc_id") < cut), "graft_span_idxd")
      Dedup.deleteFromSpanIndex(
        docs.filter(col("doc_id") < cut && col("doc_id") % 7 === 1).select("doc_id"),
        "graft_span_idxd")
    }
    Dedup.spanRewriteIncremental(docs.filter(col("doc_id") >= cut), "graft_span_idxd")
  }

  /**
   * The MAINTAINED span rewrite: standing 90% of the corpus persists
   * as a bucketed span index; the arriving 10% batch rewrites against
   * it at batch-sized cost (Dedup.spanRewriteIncremental). Oracle is
   * the identical global replay restricted to the batch docs.
   */
  private def dedupSpanRewriteIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cut = (docs.agg(max("doc_id")).head.getLong(0) + 1L) * 9L / 10L
    if (!s.catalog.tableExists("graft_span_idx"))
      Dedup.writeSpanIndex(docs.filter(col("doc_id") < cut), "graft_span_idx")
    Dedup.spanRewriteIncremental(docs.filter(col("doc_id") >= cut), "graft_span_idx")
  }

  /**
   * DSIR-style importance weights toward the doc_id%50 exemplar
   * "target domain". maxVocab=20 deliberately binds on the fixture's
   * 31-type vocabulary so the capped-LM OOV path is exercised
   * cross-engine, not just in unit tests.
   */
  private def textImportance(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextAnalysis.importanceWeights(docs, docs.filter(col("doc_id") % 50 === 0),
      maxVocab = 20)
  }

  /**
   * Mergeable-sketch hierarchical rollup (the LibMR accumulate-and-
   * merge shape as Spark datasketches): per-nation HLL sketches of
   * the customer set union up to regions WITHOUT re-touching rows —
   * the second level aggregates fixed-size sketch buffers only. The
   * estimate is asserted within 5 % of the exact distinct count
   * (default lgK=12 ⇒ ~1.6 % expected error), mirroring the
   * q_approx_distinct bounded-error oracle pattern.
   */
  private def qHllUnion(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
    val perNation = cust.groupBy("r_name", "n_name")
      .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
    perNation.groupBy("r_name")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
      .join(cust.groupBy("r_name").agg(countDistinct("c_custkey").as("exact")), "r_name")
      .select(col("r_name"), col("exact"),
        (abs(col("approx") - col("exact")) <= col("exact") * 0.05).as("union_ok"))
  }

  /**
   * One-pass KMV column profiler over `orders`: rows / nulls /
   * min-max / distinct estimate per column, every value (estimate
   * included) md5-replayable — [[graft.operators.Sketches.profile]].
   */
  private def qProfile(s: SparkSession, dir: String): DataFrame =
    operators.Sketches.profile(t(s, dir, "orders"), Seq(
      "o_orderkey" -> col("o_orderkey"),
      "o_custkey" -> col("o_custkey"),
      "o_orderstatus" -> col("o_orderstatus"),
      "o_totalprice" -> col("o_totalprice").cast("decimal(12,2)"),
      "o_orderdate" -> date_format(col("o_orderdate"), "yyyy-MM-dd"),
      "o_orderpriority" -> col("o_orderpriority")))

  /**
   * Theta-style KMV set algebra between document sources over
   * word-5-gram shingles: exact union/intersection plus the sketch
   * estimates, all bit-replayable — [[graft.operators.Sketches.kmvSourceOps]].
   */
  private def qKmvOps(s: SparkSession, dir: String): DataFrame =
    operators.Sketches.kmvSourceOps(t(s, dir, "documents"))

  /**
   * Per-status price quantiles off the deterministic md5 bottom-512
   * row sample — type-1 quantiles, bit-replayable —
   * [[graft.operators.Sketches.sampleQuantiles]].
   */
  private def qSketchQuantiles(s: SparkSession, dir: String): DataFrame =
    operators.Sketches.sampleQuantiles(t(s, dir, "orders"),
      groupCol = "o_orderstatus", valCol = "o_totalprice", idCol = "o_orderkey")

  /**
   * Deterministic train/val/test split (8/1/1) by content-independent
   * id hash — the reproducible-split step every training pipeline
   * runs. Same md5 discipline as the samplers: split = low bits of
   * md5("split:"+id) mod 10, so membership never changes as the
   * corpus grows and any engine reproduces it.
   */
  /**
   * Pipeline observability via `Dataset.observe` (the production
   * metric hook: named aggregates ride the SAME job as the query —
   * no second scan — and surface through the observation listener).
   * The corpus scan runs once with doc/token counters observed; the
   * query returns the observed metrics, so the oracle proves observe
   * sees exactly what a direct aggregate sees.
   */
  private def qObserveMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val obs = org.apache.spark.sql.Observation("census")
    val docs = t(s, dir, "documents").observe(obs,
      count(lit(1)).as("n_docs"),
      sum(size(split(lower(col("text")), " ")).cast("long")).as("n_tokens"))
    docs.select("doc_id").foreach(_ => ()) // one materializing pass
    val m = obs.get
    Seq((m("n_docs").asInstanceOf[Long], m("n_tokens").asInstanceOf[Long]))
      .toDF("n_docs", "n_tokens")
  }

  /** Publishing layout: per-shard manifest (counts, sums, xor id checksum) off the md5 shard gate. */
  private def corpusShardManifest(s: SparkSession, dir: String): DataFrame =
    Curation.shardManifest(t(s, dir, "documents"), nShards = 16)

  private def corpusSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = md5lo64(concat(lit("split:"), col("doc_id").cast("string")))
      .bitwiseAND(lit(16383L)) % 10
    t(s, dir, "documents")
      .withColumn("split",
        when(bucket <= 7, "train").when(bucket === 8, "val").otherwise("test"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(lower(col("text")), " ")).cast("long")).as("n_tokens"))
  }

  /**
   * Exact stratified split (Curation.stratifiedSplit): every source's
   * 80/10/10 allocation is within one row of exact (vs the
   * hash-bucket split's binomial noise). The shuffle key is
   * md5('ssplit:'||doc_id) — deterministic, unordered, identically
   * computable by the oracle's row_number replay.
   */
  private def corpusSplitStratified(s: SparkSession, dir: String): DataFrame =
    Curation.stratifiedSplit(t(s, dir, "documents"), col("source"),
        md5(concat(lit("ssplit:"), col("doc_id").cast("string"))),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"))

  /**
   * Recrawl snapshot delta: two snapshots carved deterministically out
   * of `documents` by the md5("snap:"+id) bucket (prev drops bucket%20=0,
   * next drops bucket%23=1 and rewrites text for bucket%17=2), then
   * [[graft.operators.Curation.snapshotDiff]] classifies every id as
   * added/removed/changed/unchanged off (id, content-hash) projections —
   * the join never moves document text. Output: per-source status counts.
   */
  /** The hash-carved recrawl snapshots shared by corpus_diff / corpus_incr_stats. */
  private def snapshots(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val bk = md5lo64(concat(lit("snap:"), col("doc_id").cast("string")))
      .bitwiseAND(lit(16383L))
    val base = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"), bk.as("__bk"))
    val prev = base.filter(col("__bk") % 20 =!= 0)
      .select(col("doc_id"), col("source"), col("text"))
    val next = base.filter(col("__bk") % 23 =!= 1)
      .select(col("doc_id"), col("source"),
        when(col("__bk") % 17 === 2, concat(col("text"), lit(" [updated]")))
          .otherwise(col("text")).as("text"))
    (prev, next)
  }

  private def corpusDiff(s: SparkSession, dir: String): DataFrame = {
    val (prev, next) = snapshots(s, dir)
    Curation.snapshotDiff(prev.select("doc_id", "text"),
        next.select("doc_id", "text"), "doc_id", Seq("text"))
      .join(t(s, dir, "documents").select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"))
  }

  /**
   * Materialized-view maintenance: per-source stats of the `next`
   * snapshot produced by merging the `prev` view with delta-only
   * aggregates ([[graft.operators.Curation.incrementalStats]]); the
   * oracle aggregates `next` directly — equality proves the
   * incremental algebra end-to-end.
   */
  private def corpusIncrStats(s: SparkSession, dir: String): DataFrame = {
    val (prev, next) = snapshots(s, dir)
    Curation.incrementalStats(prev, next)
  }

  /**
   * CDC APPLY (MERGE INTO semantics): the recrawl delta between the
   * two hash-carved snapshots — deletes (ids leaving), upserts (ids
   * arriving or rewritten) — applied to the prev snapshot via
   * [[graft.operators.Curation.applyDelta]]. The oracle constructs
   * the next snapshot DIRECTLY: equality proves the merge reproduces
   * the target table from base + delta, the warehouse upsert
   * contract. The anti-join's right side is the delta's id set
   * (broadcasts at any corpus size); document text never shuffles.
   */
  private def corpusApplyDelta(s: SparkSession, dir: String): DataFrame = {
    val (prev, next) = snapshots(s, dir)
    val bk = md5lo64(concat(lit("snap:"), col("doc_id").cast("string")))
      .bitwiseAND(lit(16383L))
    val dels = prev.withColumn("__bk", bk).filter(col("__bk") % 23 === 1)
      .select(col("doc_id"), col("source"), col("text"), lit("D").as("op"))
    val upserts = next.withColumn("__bk", bk)
      .filter(col("__bk") % 20 === 0 || col("__bk") % 17 === 2)
      .select(col("doc_id"), col("source"), col("text"), lit("U").as("op"))
    Curation.applyDelta(prev, dels.unionByName(upserts))
      .select(col("doc_id"), col("source"), md5(col("text")).as("text_md5"))
  }

  /**
   * Weighted sample: 20 docs per source, probability ∝ token count,
   * via deterministic A-ES ([[graft.operators.Curation.weightedSample]]);
   * the round6'd ranking key is part of the output so the oracle pins
   * the key arithmetic, not just membership.
   */
  private def corpusWeightedSample(s: SparkSession, dir: String): DataFrame =
    Curation.weightedSample(t(s, dir, "documents"), k = 20,
        weight = size(split(lower(col("text")), " ")))
      .select(col("source"), col("doc_id"), col("ws_key"))

  /** DSIR resampling over the oracled importance weights (rate 0.5, hash gate). */
  private def corpusResample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Curation.importanceResample(docs, docs.filter(col("doc_id") % 50 === 0),
      rate = 0.5, maxVocab = 20)
  }

  /** BM25 lexical retrieval: top-50 docs for a 3-term query (Retrieval). */
  /**
   * Ranking-quality evaluation ([[Retrieval.ndcgAtK]]): a
   * deterministic tf/length retriever is scored by nDCG@10 against
   * graded tf relevance for three term queries. The arithmetic is
   * exact-rational doubles (tf/len), so the system ordering needs no
   * rounding guard; the ideal cut uses the per-key heap.
   */
  private def retrievalNdcg(s: SparkSession, dir: String): DataFrame = {
    val (results, rels) = tfLenRetrieval(s, dir)
    Retrieval.ndcgAtK(results, rels, k = 10)
  }

  /**
   * Shared eval fixture for the ranking metrics: a deterministic
   * tf/length retriever over three term queries — graded tf
   * relevance, exact-rational scores (no rounding-boundary hazard),
   * heap-cut top-10 with ranks windowed over the ≤10 survivors.
   * Returns (results(query, rank, doc_id), rels(query, doc_id, rel)).
   */
  private def tfLenRetrieval(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    val scored = Seq("hash", "merge", "join").map { term =>
      toks.select(lit(term).as("query"), col("doc_id"),
        size(filter(col("w"), x => x === term)).cast("double").as("rel"),
        (size(filter(col("w"), x => x === term)).cast("double")
          / size(col("w"))).as("score"))
    }.reduce(_ unionByName _).filter(col("rel") > 0)
    val cut = graft.relational.Relational.topKPerKey(scored,
      Seq(col("query")), Seq(col("score").desc, col("doc_id").asc), 10)
    val w = Window.partitionBy("query").orderBy(col("score").desc, col("doc_id"))
    val results = cut.withColumn("rank", row_number().over(w))
      .select("query", "rank", "doc_id")
    (results, scored.select("query", "doc_id", "rel"))
  }

  /**
   * MRR + recall@10 for the same tf/length retriever and term queries
   * as [[retrievalNdcg]] ([[Retrieval.rankingMetrics]]).
   */
  private def retrievalMetrics(s: SparkSession, dir: String): DataFrame = {
    val (results, rels) = tfLenRetrieval(s, dir)
    Retrieval.rankingMetrics(results, rels, k = 10)
  }

  private def textBm25(s: SparkSession, dir: String): DataFrame =
    Retrieval.bm25TopK(t(s, dir, "documents"), Seq("hash", "merge", "join"), k = 50)

  /**
   * Hybrid search: BM25 lexical top-50 fused with the vector top-50
   * for query vector 0 by reciprocal rank (c=60). Ranks are assigned
   * within the already-bounded 50-row lists (the windows below rank
   * 50 rows, not the corpus), then fused by [[Retrieval.rrfFuse]].
   */
  private def retrievalRrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = Retrieval.bm25TopK(t(s, dir, "documents"), Seq("hash", "merge", "join"), k = 50)
      .select(col("doc_id").as("id"),
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long").as("rank"))
    val embs = t(s, dir, "embeddings")
    val sem = Similarity.bruteForceTopK(embs, embs.filter(col("vec_id") === 0), k = 50)
      .select(col("neighbor_id").as("id"), col("rank").cast("long").as("rank"))
    Retrieval.rrfFuse(lex, sem, kOut = 20)
  }

  /**
   * One BPE-training step: the top-20 adjacent token pairs by corpus
   * frequency (the merge-candidate ranking a tokenizer trainer
   * computes each round). One explode + count shuffle; ties broken by
   * pair string so the ranking is deterministic cross-engine.
   */
  private def textBpePairs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      // fused one-pass bigram strings: the composed slice/concat_ws
      // form re-inlines split() per window (O(tokens²) per doc,
      // measured 4× on this query at sf0.1)
      .select(explode(shingle_strings(lower(col("text")), 2)).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)

  /**
   * Train→apply BPE: learn the top-20 adjacent-pair merge table from
   * the corpus (one counting round), then segment every document with
   * it — greedy rank-order application in the scan stage
   * (functions.BpeSegmentExpr). The DuckDB oracle replays the greedy
   * merges as a recursive chain of string replaces over a
   * double-space-separated encoding.
   */
  private def textBpeApply(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextAnalysis.bpeApply(docs, TextAnalysis.bpeTrain(docs, nMerges = 20))
  }

  /**
   * TRUE iterative BPE (TextAnalysis.bpeTrainIterative): merge r is
   * selected after re-counting over the corpus as segmented by
   * merges 1..r-1. Output = the learned merge table (rank, x, y,
   * count-at-selection), U+0001 joiners rendered as spaces. The
   * DuckDB oracle replays every round: a generated chain of
   * (count → top-1 → replace) CTEs over the same double-space
   * encoding as text_bpe_apply.
   */
  private def textBpeIterative(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextAnalysis.bpeTrainIterative(t(s, dir, "documents"), nMerges = 8)
      .zipWithIndex.map { case ((x, y, c), i) =>
        ((i + 1).toLong, x.replace('\u0001', ' '), y.replace('\u0001', ' '), c)
      }.toDF("rank", "x", "y", "cnt")
  }

  /**
   * BATCHED iterative BPE (TextAnalysis.bpeTrainBatched): many merges
   * per corpus scan under the disjoint-prefix + strict-cutoff rules
   * that make the batch EXACTLY the sequential algorithm — so the
   * oracle is the same sequential round-by-round SQL replay as
   * text_bpe_iterative, just deeper. The driver's hash compare on
   * this query is the batched≡sequential law run at the oracle bar
   * on the real corpus.
   */
  private def textBpeBatched(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextAnalysis.bpeTrainBatched(t(s, dir, "documents"), nMerges = 16)
      .zipWithIndex.map { case ((x, y, c), i) =>
        ((i + 1).toLong, x.replace('\u0001', ' '), y.replace('\u0001', ' '), c)
      }.toDF("rank", "x", "y", "cnt")
  }

  /**
   * Stream-static enrichment census (batch twin — the streaming run
   * over the same plan, with the dimension broadcast, is proven
   * equivalent in StreamingSpec).
   */
  private def qStreamEnrich(s: SparkSession, dir: String): DataFrame =
    EventStreams.enrichedSegmentCensus(
      Tables.events(s, dir), t(s, dir, "customer"))

  /**
   * Three-step view→click→purchase funnel census (batch twin of the
   * chained stream-stream join — StreamingSpec proves the streaming
   * run emits the identical triples).
   */
  private def qStreamFunnel(s: SparkSession, dir: String): DataFrame =
    EventStreams.funnelStats(Tables.events(s, dir), windowMinutes = 360)

  /**
   * Exact φ-heavy hitters over the corpus token stream via two-pass
   * Misra-Gries (Sketches): identical to a full-vocabulary groupBy,
   * but only candidate keys ever shuffle.
   */
  private def qHeavyHitters(s: SparkSession, dir: String): DataFrame =
    Sketches.heavyHitters(
      t(s, dir, "documents").select(explode(split(lower(col("text")), " ")).as("tok")),
      "tok", phi = 0.03)

  /**
   * Count-min sketch estimates vs exact counts for the 20 most
   * frequent tokens (depth 4 × width 8192, md5 cells): the mergeable
   * approximate-frequency summary whose build shuffle is bounded at
   * partitions×depth×width rows however large the vocabulary. The
   * oracle replays every cell bit-identically.
   */
  private def qCmsTopk(s: SparkSession, dir: String): DataFrame =
    Sketches.cmsEstimates(
      t(s, dir, "documents").select(explode(split(lower(col("text")), " ")).as("tok")),
      "tok").select(col("k").as("tok"), col("exact"), col("est"))

  /**
   * PageRank (3 fixed iterations, d=0.85) over the part co-purchase
   * graph: parts sharing an order (1-in-10 sample of orders) are
   * linked. The oracle replays the same 3 iterations as chained CTEs.
   */
  private def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    Graph.pagerank(Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"), iters = 3)
  }

  /**
   * Weighted SSSP over the co-purchase graph: edge weight
   * round6(1/shared-order-count) — frequently co-bought parts are
   * "close" — relaxed 4 Bellman–Ford rounds from the smallest part
   * id. Distances exact for ≤4-hop paths (the bounded-rounds
   * contract the BFS query also uses).
   */
  private def graphSssp(s: SparkSession, dir: String): DataFrame = {
    val source = ssspEdges(s, dir).agg(min("src").as("node"))
    Graph.weightedShortestPaths(ssspEdges(s, dir), source, rounds = 4)
  }

  /** Shared weighted co-purchase edge build for the SSSP pair: the
    * posting-list idiom (one groupBy + in-group pair explosion)
    * instead of the blocked self-join — same (src, dst, cnt) table
    * (each shared order contributes one a≠b ordered pair either way),
    * one exchange fewer and ~10% faster at sf0.1 (guide §2.4). */
  private def ssspEdges(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
      .select("l_orderkey", "l_partkey").distinct()
    // pre-filter the 2..1000 band on a COUNTED size, then collect only
    // surviving groups (guide §5): the previous collect-then-filter
    // buffered each order's full part list before dropping oversize
    // groups — a pathological million-item group would hold ~8 MB in
    // one aggregation buffer. The count aggregate ships (key, partial
    // count) rows only, and the semi-join + collect reuse one
    // hash-partitioning by l_orderkey. Same (src, dst, cnt) multiset
    // (law-tested: only which groups SURVIVE ever mattered).
    val sized = li.groupBy("l_orderkey").agg(count(lit(1)).as("n_items"))
      .filter(col("n_items").between(2, 1000))
      .select("l_orderkey")
    li.join(sized, Seq("l_orderkey"), "left_semi")
      .groupBy("l_orderkey")
      .agg(collect_list(col("l_partkey")).as("items"))
      .select(explode(col("items")).as("src"), col("items"))
      .select(col("src"), explode(col("items")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
      .select(col("src"), col("dst"), round(lit(1.0) / col("cnt"), 6).as("w"))
  }

  /**
   * The fixpoint variant (Graph.weightedShortestPathsConverged):
   * relaxation runs until the distance table stops changing
   * (checksum-gated exact check), so every reachable node carries its
   * true shortest distance. Oracle chains 12 relaxation rounds — a
   * fixpoint for the co-purchase graph's small diameter, asserted
   * green at both fixture scales.
   */
  private def graphSsspConverged(s: SparkSession, dir: String): DataFrame = {
    val source = ssspEdges(s, dir).agg(min("src").as("node"))
    Graph.weightedShortestPathsConverged(ssspEdges(s, dir), source)
  }

  /**
   * Random walk with restart from the 5 smallest part ids in the
   * co-purchase graph (Graph.personalizedPagerank): "parts related
   * to these seeds" — restart mass pinned to the seed set, 3 rounds.
   */
  private def graphPPR(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    val edges = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    val seeds = edges.select(col("src").as("node")).distinct().orderBy("node").limit(5)
    Graph.personalizedPagerank(edges, seeds, iters = 3)
  }

  /**
   * Johnson-Lindenstrauss random projection 64→16 dims with
   * md5-derived ±1 planes; emits the first 4 components and the
   * projected norm (all 16 components feed the norm).
   */
  /**
   * Distributed PCA ([[Similarity.pcaProject]]): one-pass covariance
   * aggregate, driver-side d×d power-iteration eigensolve (20 fixed
   * steps, Hotelling deflation), scan-stage projection. The oracle
   * unrolls the same 20 steps per component in SQL.
   */
  private def embPca(s: SparkSession, dir: String): DataFrame =
    Similarity.pcaProject(t(s, dir, "embeddings"), k = 2, iters = 20)

  /**
   * PCA model MAINTENANCE: the corpus arrives as two ingest batches;
   * each contributes one O(d²) [[Similarity.momentState]] row, the
   * model re-fits from the MERGED states (the already-ingested batch
   * is never rescanned), and the projection of the full corpus equals
   * the full-corpus fit — same oracle as emb_pca. The mergeable-
   * summary law, applied to covariance.
   */
  /**
   * Whitened PCA: each component scaled to unit variance by its
   * Rayleigh-quotient λ — the OPQ-style preprocessing that stops the
   * dominant direction from hogging every PQ codebook bit. Oracle
   * replays the λs off the unrolled power iterates.
   */
  private def embPcaWhiten(s: SparkSession, dir: String): DataFrame =
    Similarity.pcaProject(t(s, dir, "embeddings"), k = 2, iters = 20,
      whiten = true)

  /**
   * PCA model DELETE (downdate): the upper half of the corpus is
   * retracted; the model re-fits from (full − removed) moment
   * subtraction ([[Similarity.subtractMomentState]]) — survivors are
   * never rescanned for the fit — and projects the survivors. Oracle
   * runs the full pipeline over the surviving rows only.
   */
  private def embPcaDelete(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    val cut = embs.agg(max("vec_id")).head.getLong(0) / 2
    val state = Similarity.subtractMomentState(
      Similarity.momentState(embs),
      Similarity.momentState(embs.filter(col("vec_id") > cut)))
    Similarity.pcaProjectFromState(embs.filter(col("vec_id") <= cut), state,
      k = 2, iters = 20)
  }

  private def embPcaIncr(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    val cut = embs.agg(max("vec_id")).head.getLong(0) / 2
    val states = Similarity.momentState(embs.filter(col("vec_id") <= cut))
      .unionByName(Similarity.momentState(embs.filter(col("vec_id") > cut)))
    Similarity.pcaProjectFromState(embs,
      Similarity.mergeMomentStates(states), k = 2, iters = 20)
  }

  private def embProject(s: SparkSession, dir: String): DataFrame = {
    val k = 16
    val proj = Similarity.randomProjection(t(s, dir, "embeddings"), k = k, dims = 64)
    val norm = sqrt((0 until k).map(j => col(s"p_$j") * col(s"p_$j")).reduce(_ + _))
    proj.select(col("vec_id"),
      round(col("p_0"), 4).as("p0"), round(col("p_1"), 4).as("p1"),
      round(col("p_2"), 4).as("p2"), round(col("p_3"), 4).as("p3"),
      round(norm, 4).as("pnorm"))
  }

  /**
   * Recall@5 of nearest-neighbor search in the 16-dim JL-projected
   * space against the exact 64-dim ranking, per query vector — the
   * quality measurement that justifies running ANN on projected
   * vectors at scale (4× less data through every shuffle). Both
   * rankings and the set intersection are deterministic, so DuckDB
   * replays the whole measurement.
   */
  private def embRecall(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    val queries = embs.filter(col("vec_id") < 20)
    val full = Similarity.bruteForceTopK(embs, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val projAll = Similarity.randomProjection(embs, k = 16, dims = 64)
      .select(col("vec_id"), array((0 until 16).map(j => col(s"p_$j")): _*).as("embedding"))
    val proj = Similarity.bruteForceTopK(projAll, projAll.filter(col("vec_id") < 20), k = 5)
      .select(col("query_id"), col("neighbor_id"))
    full.join(proj, Seq("query_id", "neighbor_id"))
      .groupBy("query_id")
      .agg((count(lit(1)) / 5.0).as("recall5"))
  }

  /**
   * Triangle count over the part co-purchase graph (same 1-in-10
   * sample as graph_pagerank) via degree-oriented wedge join — each
   * triangle generated exactly once at its smallest-(deg,id) vertex.
   * The oracle counts the same triangles by brute 3-way join.
   */
  private def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    Graph.triangleCount(Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"))
  }

  /** Bounded BFS: hop distances (≤3) from the min-key node of the co-purchase graph. */
  private def graphBfs(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    val edges = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    Graph.bfsDistances(edges, edges.agg(min(col("src")).as("node")), maxDepth = 3)
  }

  /**
   * Label-propagation communities (3 fixed rounds, min-label ties)
   * over the co-purchase graph; output is the community-size census.
   * The oracle replays each round as chained CTEs.
   */
  /**
   * Degree distribution of the co-purchase graph — the first
   * governance look at any graph (hub detection, skew sizing for the
   * wedge/LPA joins): degree per node off one edge aggregation, then
   * the |distinct degrees|-row histogram.
   */
  private def graphDegrees(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      .groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
  }

  /**
   * 8-core of the co-purchase graph ([[Graph.kCore]]) — genuinely
   * iterative peeling (11 rounds to the fixpoint at sf0.01). The
   * oracle unrolls 18 peel rounds: once the fixpoint is reached the
   * spare rounds are no-ops, so any convergence depth ≤ 18 replays
   * exactly.
   */
  private def graphKcore(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    Graph.kCore(Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"), k = 8)
  }

  /**
   * 5-truss of the co-purchase graph ([[Graph.kTruss]]): every
   * surviving edge closes ≥3 triangles within the truss — the edge-
   * level cohesion cut (4 peel rounds to fixpoint at sf0.01; the
   * oracle unrolls 8, fixpoint idempotence absorbing the spares).
   * Output is canonical edges with in-truss support.
   */
  private def graphKtruss(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    Graph.kTruss(Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"), k = 5)
  }

  /**
   * Newman modularity of the 3-round LPA communities
   * ([[Graph.modularity]]) — the community family's quality metric.
   * Oracle replays the LPA rounds (the graph_communities chain) and
   * the Q aggregate; intra/degree sums are exact integers, the final
   * community-sized sum rounds to 6dp.
   */
  private def graphModularity(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    val edges = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      .localCheckpoint() // feeds LPA AND the modularity aggregates
    Graph.modularity(edges, Graph.labelPropagation(edges))
  }

  /**
   * Full coreness decomposition of the co-purchase graph
   * ([[Graph.coreness]], h-index fixpoint — 46 rounds at sf0.01).
   * Oracle unrolls 56 h-index rounds; once the fixpoint is reached
   * the spare rounds are no-ops. Cross-checks [[graphKcore]]: nodes
   * with coreness ≥ 8 are exactly the 8-core.
   */
  private def graphCoreness(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    Graph.coreness(Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"))
  }

  /**
   * Harmonic centrality from the 16 smallest part ids, depth 3
   * ([[Graph.harmonicCentrality]] — one multi-source BFS). Oracle
   * replays the three relax+min rounds per source key.
   */
  private def graphHarmonic(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    val edges = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    val sources = edges.select(col("src").as("node")).distinct()
      .orderBy("node").limit(16)
    Graph.harmonicCentrality(edges, sources, maxDepth = 3)
  }

  /**
   * Degree assortativity of the co-purchase graph
   * ([[Graph.assortativity]]): one corr aggregate over degree-joined
   * edges.
   */
  private def graphAssortativity(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    Graph.assortativity(Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"))
  }

  /**
   * Transitivity of the co-purchase graph
   * ([[Graph.clusteringCoefficient]]): 3·triangles / wedges.
   */
  private def graphClustering(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    Graph.clusteringCoefficient(
      Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"))
  }

  private def graphCommunities(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
    Graph.labelPropagation(Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"), iters = 3)
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_members"))
  }

  /**
   * Event-sequence pattern matching (the MATCH_RECOGNIZE shape): per
   * user, the chronological event-type initial string and the count
   * of non-overlapping view→click→purchase subsequence matches, with
   * arbitrary other events between the steps. Sorting happens inside
   * each user's collected array (sort_array on (ts, event_id)
   * structs) — no global sort, one shuffle.
   */
  private def qEventPattern(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val seq0 = ev.groupBy("user_id")
      .agg(concat_ws("", transform(
        sort_array(collect_list(struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")))),
        x => x.getField("c"))).as("seq"))
    seq0.select(col("user_id"),
        length(col("seq")).cast("long").as("n_events"),
        size(regexp_extract_all(col("seq"), lit("v[^vcp]*c[^vcp]*p"), lit(0)))
          .cast("long").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /**
   * Lloyd's k-means (k=8, 3 fixed iterations, cosine metric,
   * id-modulo seeds): per-cluster census of the final assignment.
   * The oracle replays every round as chained CTEs.
   */
  private def embKmeans(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansCensus(t(s, dir, "embeddings"), k = 8, iters = 3)

  /**
   * Cluster-balanced diversity sampling — the "cluster, then take a
   * uniform quota per cluster" step of modern curation recipes
   * (SemDeDup/DCLM shape): deterministic k-means assignment, then an
   * EXACT 10-vector quota per cluster in md5 order via the heap
   * top-k (no per-cluster window task). Oracle replays the k-means
   * rounds and the row_number cut.
   */
  private def embClusterSample(s: SparkSession, dir: String): DataFrame =
    graft.relational.Relational.topKPerKey(
      Similarity.kmeansAssign(t(s, dir, "embeddings"), k = 8, iters = 3)
        .withColumn("_key", md5(concat(lit("cbal:"), col("id").cast("string")))),
      Seq(col("cl")), Seq(col("_key").asc, col("id").asc), 10)
      .select(col("cl"), col("id").as("vec_id"))

  /** Per-cluster simplified silhouette over the deterministic k-means assignment. */
  private def embSilhouette(s: SparkSession, dir: String): DataFrame =
    Similarity.silhouette(t(s, dir, "embeddings"), k = 8, iters = 3)

  /** Vocabulary coverage curve: types needed to cover 50/90/99 % of token mass. */
  private def textVocabCoverage(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(t(s, dir, "documents"))

  /**
   * Product quantization (8 subspaces × 16 codewords over 64 dims):
   * per-vector PQ codes + reconstruction error. The oracle replays
   * the id-seeded codebooks and the per-subspace argmin in SQL.
   */
  private def embPq(s: SparkSession, dir: String): DataFrame =
    Similarity.productQuantize(t(s, dir, "embeddings"), m = 8, k = 16)

  /**
   * PQ asymmetric-distance ANN: top-5 neighbors for the first 10
   * vectors scored from codes + codebooks only. Distances round to 6
   * decimals before ranking so the SQL replay orders identically.
   */
  private def annPq(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    Similarity.pqTopK(embs, embs.filter(col("vec_id") < 10), topk = 5)
  }

  /**
   * PQ quality measurement: recall@5 of the ADC code-only ranking
   * against the exact cosine top-5 — the emb_recall pattern applied
   * to product quantization (what m/k cost in recall is the decision
   * a billion-vector deployment actually makes). Queries with zero
   * overlap keep a 0.0 row (left join from the query set).
   */
  private def annRecallPq(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    val queries = embs.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(embs, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val pq = Similarity.pqTopK(embs, queries, topk = 5)
      .select(col("query_id"), col("neighbor_id"))
    val overlap = exact.join(pq, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    queries.select(col("vec_id").as("query_id"))
      .join(overlap, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        (coalesce(col("hits"), lit(0L)) / 5.0).as("recall5"))
  }

  /**
   * IVF-PQ composition: coarse 32-list routing (nprobe=8) + ADC
   * scoring over PQ codes inside the probed lists — FAISS's standard
   * billion-scale index shape. Oracle replays both stages in SQL.
   */
  private def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    Similarity.ivfPqTopK(embs, embs.filter(col("vec_id") < 10), topk = 5)
  }

  /**
   * IVF-PQ search against the PERSISTED index (Similarity
   * .writeAnnIndex): centroids/codebooks/codes live as tables, the
   * query reads only its probed lists' buckets, the float corpus is
   * never rescanned. Built from the same id-seeded quantizer ⇒
   * results bit-identical to ann_ivfpq (same oracle).
   */
  private def annIndexPersisted(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    if (!s.catalog.tableExists("graft_ann_idx_codes"))
      Similarity.writeAnnIndex(embs, "graft_ann_idx")
    Similarity.annIndexTopK(embs.filter(col("vec_id") < 10), "graft_ann_idx")
  }

  /**
   * Metadata-FILTERED search against the persisted index — the
   * vector-DB pattern: the label rides the codes table (writeAnnIndex
   * metaCols), so the predicate applies inside the bucket-pruned
   * index scan. Top-k is computed over passing candidates only (a
   * post-filtered top-k can come up short; this can't), and the float
   * corpus is never read.
   */
  private def annIndexFiltered(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    if (!s.catalog.tableExists("graft_ann_idxf_codes"))
      Similarity.writeAnnIndex(embs, "graft_ann_idxf", metaCols = Seq("label"))
    Similarity.annIndexTopK(embs.filter(col("vec_id") < 10), "graft_ann_idxf",
      candidateFilter = Some(col("label") === 3))
  }

  /**
   * Vector-index MAINTENANCE: index built from the first 90% (which
   * also trains the frozen quantizer), last 10% appended under it
   * (Similarity.appendToAnnIndex — encode + route only, batch-sized),
   * then searched. Oracle replays the same frozen-quantizer
   * semantics: centroids/codebooks from the 90%, search over all.
   */
  private def annIndexAppend(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    val cut = (embs.agg(max("vec_id")).head.getLong(0) + 1L) * 9L / 10L
    if (!s.catalog.tableExists("graft_ann_idxa_codes")) {
      Similarity.writeAnnIndex(embs.filter(col("vec_id") < cut), "graft_ann_idxa")
      Similarity.appendToAnnIndex(embs.filter(col("vec_id") >= cut), "graft_ann_idxa")
    }
    Similarity.annIndexTopK(embs.filter(col("vec_id") < 10), "graft_ann_idxa")
  }

  /**
   * Quantizer DRIFT SIGNAL (Similarity.annAssignmentResidual): the
   * index trains on the first 90%, and the one-row census measures
   * the mean cosine assignment residual of the FULL corpus against
   * the stored centroids — the observable that rises when
   * frozen-quantizer growth drifts away from the trained lists.
   * Oracle replays the id-seeded centroids and the (cos desc, _b)
   * assignment in SQL.
   */
  private def annDriftResidual(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    val cut = (embs.agg(max("vec_id")).head.getLong(0) + 1L) * 9L / 10L
    if (!s.catalog.tableExists("graft_ann_idxq_codes"))
      Similarity.writeAnnIndex(embs.filter(col("vec_id") < cut), "graft_ann_idxq")
    Similarity.annAssignmentResidual(embs, "graft_ann_idxq")
  }

  /**
   * RE-QUANTIZATION maintenance (Similarity.requantizeAnnIndex): the
   * index trains on the first 90%, grows by the last 10% under the
   * frozen quantizer, then RETRAINS over the full corpus — after
   * which it must be indistinguishable from an index freshly built
   * on everything (the training step is deterministic), so the
   * oracle is exactly the full-train IVF-PQ replay.
   */
  private def annIndexRequantize(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    val cut = (embs.agg(max("vec_id")).head.getLong(0) + 1L) * 9L / 10L
    if (!s.catalog.tableExists("graft_ann_idxr_codes")) {
      Similarity.writeAnnIndex(embs.filter(col("vec_id") < cut), "graft_ann_idxr")
      Similarity.appendToAnnIndex(embs.filter(col("vec_id") >= cut), "graft_ann_idxr")
      Similarity.requantizeAnnIndex(embs, "graft_ann_idxr")
    }
    Similarity.annIndexTopK(embs.filter(col("vec_id") < 10), "graft_ann_idxr")
  }

  /**
   * PQ reconstruction error of the stored index (Similarity
   * .pqReconstructionResidual): mean asymmetric-ADC distance between
   * each corpus vector and its OWN code under the stored codebooks —
   * the code-resolution drift signal that decides whether the
   * auto-remediation loop escalates m. Oracle replays the k=16
   * per-dimension-mean codebooks, the per-sub-block nearest-codeword
   * assignment, and the summed squared distance at the chosen codes.
   */
  private def annPqError(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    if (!s.catalog.tableExists("graft_ann_idxe_codes"))
      Similarity.writeAnnIndex(embs, "graft_ann_idxe")
    Similarity.pqReconstructionResidual(embs, "graft_ann_idxe")
      .select(col("n_vectors"), round(col("mean_pq_error"), 4).as("mean_pq_error"))
  }

  /**
   * TWO successive requantizes over the same corpus — the index
   * crosses two EPOCH generations (flat → g1 → g2, the second flip
   * sweeping the flat layout), and the query path must resolve the
   * current generation's centroids/codebooks/codes as one snapshot.
   * Retraining is deterministic, so both rebuilds land the same
   * quantizer and the oracle stays the refined IVF-PQ replay — what
   * this query adds to the gate is the epoch RESOLUTION machinery
   * (generation naming, pointer flip, old-generation sweep) under the
   * driver's rows+schema+hash bar.
   */
  private def annIndexEpoch(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    if (!s.catalog.tableExists("graft_ann_idxg_epoch")) {
      Similarity.writeAnnIndex(embs, "graft_ann_idxg")
      Similarity.requantizeAnnIndex(embs, "graft_ann_idxg")
      Similarity.requantizeAnnIndex(embs, "graft_ann_idxg")
    }
    Similarity.annIndexTopK(embs.filter(col("vec_id") < 10), "graft_ann_idxg")
  }

  /**
   * Z-order-clustered sink round-trip: lineitem laid out by the
   * Morton interleave of (l_partkey, l_suppkey); the 2-D box probe
   * after re-read skips row-groups on both columns' stats.
   */
  private def qZorderSink(s: SparkSession, dir: String): DataFrame =
    graft.sources.FileIO.zorderRoundTrip(
        t(s, dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity"),
        rtPath(dir, "zorder"), "l_partkey", "l_suppkey")
      .filter(col("l_partkey").between(10, 80) && col("l_suppkey").between(2, 6))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))

  /**
   * 2-D zone-map pruning over the z-order layout
   * ([[graft.sources.ZoneMap.prunedReadBox]]): Morton clustering
   * localizes BOTH columns per file, so the box query's candidate
   * set is the intersection of two zone filters — file skipping
   * multiplies across dimensions (asserted in PlanAuditSpec).
   * Oracle: the plain 2-D box filter (the rewrite is
   * content-preserving).
   */
  private def qZonemapZorder(s: SparkSession, dir: String): DataFrame = {
    val data = t(s, dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    val path = rtPath(dir, "zonemap2d")
    if (!new java.io.File(s"$path/_stats/_SUCCESS").exists()) {
      graft.sources.FileIO.zorderRoundTrip(data, path, "l_partkey", "l_suppkey",
        partitions = 16)
      graft.sources.ZoneMap.build(s, path, Seq("l_partkey", "l_suppkey"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_stats")
    }
    val stats = s.read.parquet(s"$path/_stats")
    graft.sources.ZoneMap.prunedReadBox(s, stats, data.schema,
        Seq(("l_partkey", lit(10L), lit(80L)), ("l_suppkey", lit(2L), lit(6L))))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
  }

  private def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(embs, embs.filter(col("vec_id") < 10), k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  /**
   * FILTERED vector search (the vector-DB "metadata predicate" shape):
   * top-5 cosine neighbors restricted to one label's corpus slice.
   * Pre-filtering beats post-filtering structurally — the predicate
   * prunes the corpus BEFORE any distance work and top-k never
   * under-fills; on a column-partitioned layout the filter becomes
   * partition pruning at the scan.
   */
  private def annFiltered(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(embs.filter(col("label") === 3),
      embs.filter(col("vec_id") < 10), k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** MMR diversified top-5 for query vector 0 over its cosine top-20 pool. */
  private def annMmr(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    Similarity.mmrTopK(embs, embs.filter(col("vec_id") === 0), k = 5, pool = 20)
  }

  /** One k-means step over labeled embeddings: centroid + nearest-centroid confusion. */
  private def annCentroid(s: SparkSession, dir: String): DataFrame =
    Similarity.centroidAssign(t(s, dir, "embeddings"))

  /**
   * IVF ANN: coarse-centroid posting lists, nprobe-bounded search.
   * Fully deterministic (id-modulo seeding + one averaging step), so
   * the DuckDB oracle replays the identical index build and probe.
   */
  private def annIvf(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    Similarity.ivfTopK(embs, embs.filter(col("vec_id") < 10), k = 5, nlist = 32, nprobe = 8)
  }

  /** md5-plane LSH (verification-grade): DuckDB recomputes identical buckets. */
  private def annLsh(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    Similarity.lshTopK(embs, embs.filter(col("vec_id") < 10), k = 5, md5Compat = true)
      .withColumn("rank", col("rank").cast("long"))
  }

  /**
   * Multi-probe LSH at HALF the tables of `ann_lsh` (2 vs 4): the
   * Hamming-1 probe fan-out recovers the recall the missing tables
   * would have bought, with the corpus-side index (the 100 TB side)
   * half the size. Oracle replays the md5 hyperplanes, the bit flips,
   * and the candidate union in SQL.
   */
  private def annMultiprobe(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    Similarity.lshMultiProbeTopK(embs, embs.filter(col("vec_id") < 10), k = 5,
        bits = 8, tables = 2, md5Compat = true)
      .withColumn("rank", col("rank").cast("long"))
  }

  private def textQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(t(s, dir, "documents"))
      .withColumn("n_tokens", col("n_tokens").cast("long"))

  /**
   * Median/MAD quality-drift census per source
   * (TextAnalysis.qualityMadCensus): discrete lower-median order
   * statistics on the bounded (source, quality) count table, so the
   * oracle replays rank selection — not interpolated percentiles,
   * whose last-ulp arithmetic differs across engines.
   */
  private def textQualityMad(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityMadCensus(t(s, dir, "documents"))

  private def textLangid(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(t(s, dir, "documents"))

  /**
   * Classifier QA: the confusion matrix of predicted vs labeled
   * language — the acceptance gate run before any classifier's
   * verdicts drive corpus filtering. One scan (the prediction is a
   * per-row column, [[TextAnalysis.predLangCol]]) + one bounded
   * aggregation: langs² cells regardless of corpus size.
   */
  private def textLangidConfusion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("pred_lang", TextAnalysis.predLangCol(col("text")))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n_docs"))

  private def textTokens(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(t(s, dir, "documents"))
      .withColumn("ws_tokens", col("ws_tokens").cast("long"))
      .withColumn("re_tokens", col("re_tokens").cast("long"))
      .withColumn("n_chars", col("n_chars").cast("long"))

  private def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(t(s, dir, "documents"))

  /**
   * Winnowing census (MOSS fingerprint selection, k=4-gram, w=5
   * window): per-doc selected-fingerprint count + minimum — the
   * ~2/(w+1)-density sample behind substring-contamination detection.
   */
  private def textWinnow(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowCensus(t(s, dir, "documents"))

  /** Zipf slope/intercept over the top-100 token ranks (power-law governance check). */
  private def textZipf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfFit(t(s, dir, "documents"))

  /**
   * Shared-winnowing-fingerprint contamination candidates: doc pairs
   * selecting ≥ 2 common fingerprints — candidate generation runs on
   * the winnowed sample, w+1× lighter than the full shingle join.
   */
  private def dedupWinnow(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowSharedPairs(t(s, dir, "documents"), minShared = 2L)

  /** Fully-distributed bigram LM (α=0.5): the no-driver-state scale path above the unigram proxy. */
  private def textBigramLm(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLmScore(t(s, dir, "documents"))

  /** Hashed linear classifier scoring (hashing trick over md5 buckets, deterministic stub weights). */
  /**
   * Reliability diagram of the hashed classifier against the quality
   * gate ([[TextAnalysis.calibrationCensus]]): clf_score deciles vs
   * the empirical rate of quality ≥ 0.5 — both sides deterministic,
   * so every bucket stat is value-oracled.
   */
  private def textCalibration(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scored = TextAnalysis.classifierScore(docs)
      .join(docs.select(col("doc_id"),
        (TextAnalysis.qualityCol(col("text")) >= 0.5).as("target")), "doc_id")
    TextAnalysis.calibrationCensus(scored, "clf_score", "target")
  }

  /**
   * ROC-AUC of the hashed classifier against the quality target
   * ([[TextAnalysis.aucRoc]] — tie-aware midranks over distinct
   * scores). Same scored join as [[textCalibration]].
   */
  private def textAuc(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scored = TextAnalysis.classifierScore(docs)
      .join(docs.select(col("doc_id"),
        (TextAnalysis.qualityCol(col("text")) >= 0.5).as("target")), "doc_id")
    TextAnalysis.aucRoc(scored, "clf_score", "target")
  }

  /**
   * Confusion matrix + precision/recall/F1/accuracy/Cohen's κ of the
   * hashed classifier's label against the quality target
   * ([[TextAnalysis.classifierEval]]) — completes the eval trio with
   * [[textCalibration]] and [[textAuc]].
   */
  private def textClassifyEval(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scored = TextAnalysis.classifierScore(docs)
      .join(docs.select(col("doc_id"),
        (TextAnalysis.qualityCol(col("text")) >= 0.5).as("target")), "doc_id")
    TextAnalysis.classifierEval(scored, "clf_label", "target")
  }

  private def textClassify(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.classifierScore(t(s, dir, "documents"))

  /**
   * TRAINED classifier (multinomial Naive Bayes,
   * [[TextAnalysis.naiveBayesModel]]): fit source-prediction on the
   * %5≠0 training split, score the held-out %5=0 split, emit each
   * doc's argmax label with its (pre-argmax-rounded) score and a
   * correctness flag. The model is a dense bounded-vocab × label
   * table; the oracle replays fit AND scoring end-to-end in SQL.
   */
  private def textNbClassify(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    // gridless-label probe: a training label whose every token falls
    // below minCount has a prior but zero in-vocab mass; the fit must
    // still emit its dense-grid rows (tn=0 smoothing) so it competes
    // in every argmax — both engines inject it so the path executes
    val trainProbe = Seq(("rare_src", "jjjuniqjjj kkkuniqkkk"))
      .toDF("label", "text")
    val model = TextAnalysis.naiveBayesModel(
      docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("source").as("label"), col("text"))
        .unionByName(trainProbe),
      "label", "text", minCount = 2)
    // the fixture's held-out slice has no all-OOV doc, so both engines
    // append a deterministic probe whose tokens can't clear minCount:
    // under the pre-fallback semantics it vanished from the output,
    // now it must surface with the prior-only argmax (oracle-checked)
    val probe = Seq((-1L, "oov_probe", "zqzqzqzq xvxvxvxv"))
      .toDF("doc_id", "source", "text")
    val test = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("source"), col("text"))
      .unionByName(probe)
    TextAnalysis.naiveBayesClassify(test, model)
      .join(test.select("doc_id", "source"), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("pred"), col("score"),
        (col("pred") === col("source")).cast("long").as("correct"))
  }

  /**
   * The classifier scored from a (bucket, weight) MODEL TABLE
   * (TextAnalysis.classifierScoreFromTable): the weights parquet is
   * written once (here, from the stub generator — in production, by a
   * training job), and the scoring path only ever sees the table.
   * Proves the model-swap claim in code: same oracle as text_classify.
   */
  private def textClassifyTable(s: SparkSession, dir: String): DataFrame = {
    if (!s.catalog.tableExists("graft_clf_weights"))
      graft.sources.Bucketing.writeSmallTable(
        TextAnalysis.classifierWeights(s), "graft_clf_weights")
    TextAnalysis.classifierScoreFromTable(
      t(s, dir, "documents"), s.table("graft_clf_weights"))
  }

  /** Language ID from a (priority, lang, token) marker table — same swap contract. */
  private def textLangidTable(s: SparkSession, dir: String): DataFrame = {
    if (!s.catalog.tableExists("graft_lang_markers"))
      graft.sources.Bucketing.writeSmallTable(
        TextAnalysis.langMarkerTable(s), "graft_lang_markers")
    TextAnalysis.langIdFromTable(t(s, dir, "documents"), s.table("graft_lang_markers"))
  }

  /** Per-doc token entropy: the gibberish/boilerplate band signal. */
  private def textEntropy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenEntropy(t(s, dir, "documents"))

  /** First 100 positions of the deterministic round-robin source interleave. */
  private def corpusInterleave(s: SparkSession, dir: String): DataFrame =
    Curation.interleaveBySource(t(s, dir, "documents"))
      .orderBy("pos").limit(100)

  /**
   * Fuzzy entity resolution on part names: deterministic typo twins
   * are planted (every 100th part, last character → 'x') on top of
   * the fixture's naturally dense near-name space ("small ring" /
   * "small rod" is a distance-2 pair) — the operator's blocking +
   * Levenshtein verification must recover the full pair set, planted
   * and natural alike, exactly as the exhaustive oracle does.
   */
  private def erEditdist(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
    val typo = part.filter(col("p_partkey") % 100 === 0)
      .select((col("p_partkey") + 1000000L).as("p_partkey"),
        concat(substring(col("p_name"), lit(1), length(col("p_name")) - 1), lit("x"))
          .as("p_name"))
    // finer blocking than the first-token default: the fixture's
    // adjective vocabulary is tiny, so first-token blocks hold
    // thousands of names at sf0.1 (quadratic pair work). First token
    // + first char of the last token keeps the planted typos (they
    // mutate the LAST char) and bounds block sizes.
    Dedup.editDistancePairs(part.unionAll(typo), "p_name", "p_partkey", maxDist = 2,
      blockKey = s => concat(substring_index(s, " ", 1),
        substring(substring_index(s, " ", -1), 1, 1)))
  }

  /**
   * Word-bigram set cosine ER (τ=0.7) on the same typo-planted part
   * names as er_editdist: candidates from AllPairs prefix filtering
   * (exact recall), verified with the Ochiai coefficient; planted
   * typo pairs land at 3/4 shared bigrams = 0.75. The oracle is the
   * UNBLOCKED all-pairs join — equality proves the prefix filter
   * loses nothing.
   *
   * Bench note (the suite's one >2s query): the COST is the output,
   * not the plan — TPC-H part names draw from a ~90-word adjective
   * vocabulary, so at sf0.1 τ=0.7 legitimately admits ~3.1M similar
   * pairs (~1M result rows/s writing them). The fixture keeps τ=0.7 /
   * shingle=2 because the planted typos sit at 0.75 — raising τ above
   * 0.75 or the shingle order would shrink the output but lose the
   * planted recall the oracle checks. A production run on low-entropy
   * keys would raise τ or block harder; the operator is unchanged.
   */
  /**
   * Fellegi–Sunter linkage over customers blocked by
   * (nation, segment): three comparison fields (acctbal thousand
   * band, last name digit, tens-of-cents digit) score each in-block
   * pair with the precomputed log-likelihood weights; output is the
   * (score, verdict) census — deterministic counts, no float-sum
   * ordering hazard.
   */
  /** Shared comparison frame for the Fellegi–Sunter queries. */
  private def fsCustomer(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey"),
      concat(col("c_nationkey").cast("string"), lit("|"), col("c_mktsegment")).as("blk"),
      floor(col("c_acctbal") / 1000).as("bal_band"),
      expr("right(c_name, 1)").as("name_tail"),
      (round(col("c_acctbal") * 100).cast("long") % 10).as("cent_band"))

  private def erFellegiSunter(s: SparkSession, dir: String): DataFrame =
    Dedup.fellegiSunterScores(fsCustomer(s, dir), "blk", "c_custkey", fsFields,
        tLower = 0.0, tUpper = 3.0)
      .groupBy("score", "verdict")
      .agg(count(lit(1)).as("n_pairs"))

  /**
   * Unsupervised Fellegi–Sunter calibration
   * (Dedup.fellegiSunterEM): λ and per-field (m, u) learned by EM
   * over the 2^3-combo agreement count table — the Splink/fastLink
   * step that turns raw pairs into principled weights without
   * labels. Oracle replays all 5 EM rounds as chained CTEs with
   * ordered list_sums and the identical round6 discipline.
   */
  private def erEmParams(s: SparkSession, dir: String): DataFrame =
    Dedup.fellegiSunterEM(fsCustomer(s, dir), "blk", "c_custkey",
      Seq("bal_band", "name_tail", "cent_band"), iters = 5)

  /**
   * The composed ER pipeline in one query: blocked pairs → EM
   * calibration (er_em_params' exact trajectory) → classification by
   * LEARNED posterior (> 0.4 — no hand weights anywhere) → connected
   * components over the matched pairs → cluster census. Every stage
   * is the oracled operator used elsewhere, chained; the oracle
   * replays EM, the per-pair posterior, and the recursive closure.
   */
  private def pipelineLinkage(s: SparkSession, dir: String): DataFrame = {
    val cust = fsCustomer(s, dir)
    val fields = Seq("bal_band", "name_tail", "cent_band")
    val agreeCols = fields.zipWithIndex.map { case (f, i) =>
      (col(s"a.$f") === col(s"b.$f")).cast("long").as(s"ag_$i") }
    // ONE blocked self-join feeds both EM calibration and
    // classification: EM only consumes the agreement-combo COUNTS, so
    // calibrating via emFromCombos over the materialized pair table
    // replays fellegiSunterEM's exact trajectory (same combo counts,
    // same init, same round6 discipline) at half the pair-generation
    // cost — previously the blocked join + agreement evaluation ran
    // once inside fellegiSunterEM and AGAIN for the classified pairs.
    val pairs = cust.as("a").join(cust.as("b"),
        col("a.blk") === col("b.blk") && col("a.c_custkey") < col("b.c_custkey"))
      .select(Seq(col("a.c_custkey").as("a_id"), col("b.c_custkey").as("b_id")) ++
        agreeCols: _*)
      .localCheckpoint()
    val em = Dedup.emFromCombos(
      pairs.groupBy("ag_0", "ag_1", "ag_2").agg(count(lit(1)).as("n_pairs")),
      k = fields.size, iters = 5)
      .select(col("ag_0"), col("ag_1"), col("ag_2"), col("p_match"))
    val matched = pairs.join(broadcast(em), Seq("ag_0", "ag_1", "ag_2"))
      .filter(col("p_match") > 0.4)
      .select(col("a_id"), col("b_id"))
    Dedup.dupClusters(matched)
      .groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
  }

  private def erCosine(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
    val typo = part.filter(col("p_partkey") % 100 === 0)
      .select((col("p_partkey") + 1000000L).as("p_partkey"),
        concat(substring(col("p_name"), lit(1), length(col("p_name")) - 1), lit("x"))
          .as("p_name"))
    Dedup.tokenCosinePairs(part.unionAll(typo), "p_name", "p_partkey",
      threshold = 0.7, shingle = 2)
  }

  /** Per-source KL divergence against the corpus unigram distribution. */
  private def corpusSourceKl(s: SparkSession, dir: String): DataFrame =
    Curation.sourceDivergence(t(s, dir, "documents"))

  /**
   * Related documents: top-3 neighbors per doc by exact n-gram
   * jaccard — the per-doc k-NN view of the shared posting-list
   * candidate generator (no threshold cut; rank cut on the heap
   * operator instead).
   */
  private def textJaccardKnn(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 5, threshold = 0.0)
    val sym = pairs.select(col("a_id").as("doc_id"), col("b_id").as("nbr_id"), col("jaccard"))
      .unionAll(pairs.select(col("b_id").as("doc_id"), col("a_id").as("nbr_id"), col("jaccard")))
    graft.relational.Relational.topKPerKey(sym,
      Seq(col("doc_id")), Seq(col("jaccard").desc, col("nbr_id").asc), 3)
  }

  /** Per-doc duplication fraction: share of a doc's shingles seen in other docs. */
  private def textDupFraction(s: SparkSession, dir: String): DataFrame =
    Curation.dupFraction(t(s, dir, "documents"))

  /** Source×source shared-shingle matrix (cross-source contamination governance). */
  private def corpusOverlapMatrix(s: SparkSession, dir: String): DataFrame =
    Curation.sourceOverlapMatrix(t(s, dir, "documents"))

  /** Quality-aware near-dup resolution: keep the best-quality member of each cluster. */
  private def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.keepBestPerCluster(docs, TextAnalysis.qualityCol(col("text")))
  }

  /**
   * Per-source quality gate as a rank cut ("keep the 25 best docs of
   * every source"): the discrete form of top-p% filtering — exact
   * cross-engine (no interpolated-percentile float hazard) and it
   * runs on the custom two-phase heap operator: map-side per-source
   * heaps, then one exchange of ≤ k·sources rows — never a global or
   * per-partition sort of the corpus.
   */
  private def corpusQualityTopk(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("quality", TextAnalysis.qualityCol(col("text")))
    graft.relational.Relational.topKPerKey(
      docs,
      keys = Seq(col("source")),
      order = Seq(col("quality").desc, col("doc_id").asc),
      k = 25)
      .select(col("source"), col("doc_id"), col("quality"))
  }

  /**
   * Per-domain contribution cap (the RefinedWeb/C4 "no domain may
   * contribute more than N docs" rule): keep a deterministic random
   * N per source — priority is an md5 gate, so the kept set is stable
   * under re-runs and the cut is unbiased within each domain. Runs on
   * the two-phase heap operator: map-side per-source heaps, one
   * exchange of ≤ k·sources rows — never a per-domain sort of the
   * corpus (at 100 TB a domain can be billions of rows; the heap
   * carries k).
   */
  private def corpusDomainCap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("pri", md5lo64(concat(lit("cap:"), col("doc_id").cast("string")))
        .bitwiseAND(lit(16383L)))
    graft.relational.Relational.topKPerKey(
      docs,
      keys = Seq(col("source")),
      order = Seq(col("pri").asc, col("doc_id").asc),
      k = 15)
      .select(col("source"), col("doc_id"))
  }

  /**
   * Per-domain TOKEN-budget cap — the cap real corpus specs state
   * ("≤ N tokens per domain", not doc counts): greedy fill in
   * deterministic-random priority order, soft-capped (the crossing
   * doc admits). Runs on [[graft.operators.Curation.domainTokenCap]]:
   * a distributed global prefix sum over the (source, pri, id) total
   * order + broadcast per-source base offsets — a billion-doc domain
   * spans partitions instead of collapsing into one task's window.
   */
  private def corpusDomainTokenCap(s: SparkSession, dir: String): DataFrame =
    Curation.domainTokenCap(t(s, dir, "documents"), budgetTokens = 500L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))

  /**
   * Deterministic EPOCH SHUFFLE: the training-order materializer.
   * Every (epoch, doc) pair hashes to a shard and a within-shard
   * position — different order every epoch, bit-reproducible from the
   * seed string alone, and shard files are built with one exchange on
   * (epoch, shard) + a per-shard sort (shard count is chosen so a
   * shard fits an executor — the WebDataset/Megatron shard-building
   * shape; there is never a global sort of the corpus).
   */
  private def corpusEpochShuffle(s: SparkSession, dir: String): DataFrame =
    Curation.epochShuffle(t(s, dir, "documents"), epochs = 2, shards = 8)

  /**
   * CURRICULUM ordering: within each training shard, higher-quality
   * docs come first (descending quality band, hash-shuffled within a
   * band so a band is not source-ordered) — the quality-curriculum
   * schedule. Same scale shape as the epoch shuffle: one exchange on
   * the shard, per-shard sorts, quality computed as a scan column.
   */
  private def corpusCurriculum(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        floor(TextAnalysis.qualityCol(col("text")) * 4).cast("long").as("band"),
        md5lo64(concat(lit("cur:"), col("doc_id").cast("string")))
          .bitwiseAND(lit(16383L)).as("h"))
      .withColumn("shard", pmod(col("h"), lit(8L)))
    val w = Window.partitionBy("shard")
      .orderBy(col("band").desc, col("h"), col("doc_id"))
    docs.withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("pos"), col("band"), col("doc_id"))
  }

  /**
   * The composed TRAIN-PREP pipeline — quality gate → per-domain cap
   * → deterministic shard assignment → per-shard manifest, the
   * end-to-end "corpus in, training shards out" chain. Every stage
   * keeps its scale shape when composed: the quality gate is a scan
   * column (no join), the cap runs on the two-phase heap (k·sources
   * rows out), the shard hash is one exchange, and the manifest is a
   * bounded aggregate — so the whole pipeline is two narrow-output
   * shuffles end to end regardless of corpus size. The oracle replays
   * the entire chain.
   */
  private def pipelineTrainPrep(s: SparkSession, dir: String): DataFrame = {
    // token counts project in the scan stage so the heap carries
    // (source, doc_id, pri, ntok) — text never leaves the scan (at
    // real cap sizes a heap of full documents is the memory bill)
    val docs = t(s, dir, "documents")
      .filter(TextAnalysis.qualityCol(col("text")) >= 0.5)
      .select(col("source"), col("doc_id"),
        md5lo64(concat(lit("cap:"), col("doc_id").cast("string")))
          .bitwiseAND(lit(16383L)).as("pri"),
        size(split(lower(col("text")), " ")).cast("long").as("ntok"))
    val capped = graft.relational.Relational.topKPerKey(docs,
      Seq(col("source")), Seq(col("pri").asc, col("doc_id").asc), k = 15)
    capped
      .withColumn("shard", pmod(md5lo64(concat(lit("ep0:"), col("doc_id").cast("string")))
        .bitwiseAND(lit(16383L)), lit(8L)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
  }

  /** Per-doc top-3 tf-idf keywords over the full vocabulary (Retrieval.keywordsTopK). */
  private def textKeywords(s: SparkSession, dir: String): DataFrame =
    Retrieval.keywordsTopK(t(s, dir, "documents"), k = 3)

  /**
   * Recursive CTE (Spark 4 WITH RECURSIVE, UNION ALL semantics — the
   * engine rejects UNION inside recursion, so cyclic-graph closure
   * stays with the iterative Dedup.dupClusters loop): an acyclic
   * ancestor walk — every part climbs its halving tree (k → k div 2)
   * to the root, yielding the depth census. Recursion depth is
   * log₂(maxkey) Spark jobs regardless of table size, each a narrow
   * self-map — the declarative shape for hierarchy/BOM walks.
   */
  private def qRecursiveCte(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("part_rec")
    s.sql(
      """WITH RECURSIVE anc(p, cur, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM part_rec
        |  UNION ALL
        |  SELECT p, cur DIV 2, depth + 1 FROM anc WHERE cur > 1)
        |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_parts
        |FROM anc WHERE cur = 1 GROUP BY depth""".stripMargin)
  }

  /** Corpus-trained unigram LM scoring: mean token NLL per doc (perplexity proxy). */
  // maxVocab=20 binds on the fixture's 31-type vocabulary — the
  // smoothed-OOV scoring path is verified against the DuckDB replay
  private def textLmScore(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLmScore(t(s, dir, "documents"), maxVocab = 20)

  /** Gopher rule census: per-source pass/fail counts for each quality gate. */
  private def textGopherCensus(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherCensus(t(s, dir, "documents"))

  /**
   * HELD-OUT LM scoring: the LM trains on the md5-gate train split
   * (buckets 0-7) and scores the test split (bucket 9) — docs the LM
   * has never seen, so tokens absent from the training vocabulary
   * take the smoothed-OOV branch. This pins the held-out/OOV
   * arithmetic cross-engine, not just in unit tests.
   */
  private def textLmHeldout(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bucket = md5lo64(concat(lit("split:"), col("doc_id").cast("string")))
      .bitwiseAND(lit(16383L)) % 10
    TextAnalysis.unigramLmScoreOn(
      docs.filter(bucket <= 7), docs.filter(bucket === 9), maxVocab = 20)
  }

  /** CCNet head/middle/tail perplexity buckets per language (LM capped as in text_lm_score). */
  private def textPplBuckets(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.pplBuckets(t(s, dir, "documents"), maxVocab = 20)

  /**
   * The composed CCNet curation pipeline in ONE statement: predict
   * language (marker heuristic, a scan column), perplexity-score
   * against the corpus LM, tercile-bucket per PREDICTED language,
   * keep head+middle — reporting per-language doc counts, kept
   * counts, and the kept set's mean NLL. The decision path an actual
   * CCNet run takes, end-to-end: every stage is the narrow/broadcast
   * shape of its standalone operator.
   */
  private def pipelineCcnet(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("pred_lang", TextAnalysis.predLangCol(col("text")))
    TextAnalysis.pplBucketed(docs, langCol = "pred_lang", maxVocab = 20)
      .withColumn("keep", col("bucket").isin("head", "middle"))
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("keep"), 1)).as("n_kept"),
        round(avg(when(col("keep"), col("nll"))), 4).as("kept_avg_nll"))
  }

  /**
   * Batch twin of the streaming curation census
   * (streaming.DocumentStreams.curatedCensus — the plan is shared
   * verbatim with the readStream path; StreamingSpec proves the
   * streaming run produces these exact rows).
   */
  private def qStreamCurate(s: SparkSession, dir: String): DataFrame =
    graft.streaming.DocumentStreams.curatedCensus(t(s, dir, "documents"))

  /**
   * Benchmark decontamination: the eval set is every 50th document
   * (standing in for a benchmark suite); report training docs sharing
   * any 5-gram with it. At 100 TB the eval n-gram set broadcasts and
   * the corpus never shuffles (Curation.contaminationReport).
   */
  /**
   * FUZZY decontamination: eval documents (every 50th id) flagged
   * against the training corpus by NEAR-duplicate jaccard (τ=0.5),
   * not exact n-gram hits — the paraphrase-contamination catch that
   * the exact-overlap report misses. Reuses the broadcast-batch
   * incremental-pairs machinery ([[Dedup.incrementalNearDupPairs]]):
   * the eval set broadcasts, the corpus never self-joins.
   */
  private def textDecontaminateFuzzy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.incrementalNearDupPairs(
      docs.filter(col("doc_id") % 50 === 0),
      docs.filter(col("doc_id") % 50 =!= 0), n = 5, threshold = 0.5)
      .select(col("new_id").as("eval_id"), col("corpus_id").as("doc_id"),
        col("jaccard"))
  }

  /**
   * The decontamination DECISION end-to-end: drop training docs hit
   * by EITHER the exact n-gram overlap report (n_shared ≥ 3) or the
   * fuzzy near-dup screen (jaccard ≥ 0.5 to any eval doc), then roll
   * up retention per source — the gate a training pipeline runs
   * before packing, composed from the two oracled detectors.
   */
  private def pipelineDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val evalDocs = docs.filter(col("doc_id") % 50 === 0)
    val exactHits = Curation.contaminationReport(train, evalDocs)
      .filter(col("n_shared") >= 3).select("doc_id")
    val fuzzyHits = Dedup.incrementalNearDupPairs(evalDocs, train,
      n = 5, threshold = 0.5).select(col("corpus_id").as("doc_id"))
    val dropped = exactHits.unionByName(fuzzyHits).distinct()
    train.join(dropped, Seq("doc_id"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
      .join(train.groupBy("source").agg(count(lit(1)).as("n_total")), "source")
      .select(col("source"), col("n_kept"), col("n_total"),
        round(col("n_kept") * lit(1.0) / col("n_total"), 4).as("retention"))
  }

  private def textDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Curation.contaminationReport(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0))
  }

  /** Overlapping token-window chunking (size 32, overlap 8). */
  private def textChunks(s: SparkSession, dir: String): DataFrame =
    Curation.chunk(t(s, dir, "documents"), size = 32, overlap = 8)
      .select(col("doc_id"), col("chunk_id"), md5(col("chunk_text")).as("chunk_md5"),
        col("n_tokens"))

  /** Gopher-style repetition filters: dup-token / top-2-gram / top-3-gram fractions. */
  private def textRepetition(s: SparkSession, dir: String): DataFrame =
    Curation.repetitionSignals(t(s, dir, "documents"))

  /**
   * PII redaction over a synthetic contact block appended to each doc
   * (the fixture corpus has no PII of its own): per-kind counts + the
   * scrubbed payload's md5.
   */
  private def textRedact(s: SparkSession, dir: String): DataFrame = {
    val withPii = t(s, dir, "documents").withColumn("pii_text",
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@mail.example.com from 10."), col("doc_id") % 200,
        lit(".0.1 call 555-"), lit(1000) + col("doc_id") % 9000))
    Curation.redactionReport(withPii, textCol = "pii_text")
  }

  /**
   * Deterministic stratified sampling: cap en at 20%, fr at 50%, keep
   * 80% of the rest — the training-mix rebalance. Output is the
   * per-language kept/total census.
   */
  /**
   * Deterministic per-source uniform 5-sample (bottom-k of the
   * md5("bk:") hash order — the distributed reservoir-sample
   * replacement on the TopKPerKey heap plan).
   */
  private def corpusBottomK(s: SparkSession, dir: String): DataFrame =
    Curation.bottomKSample(t(s, dir, "documents"), k = 5)
      .select(col("source"), col("doc_id"))

  private def corpusSample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val kept = Curation.stratifiedSample(docs,
      Map("en" -> 0.2, "fr" -> 0.5), defaultRate = 0.8)
    docs.groupBy("lang").agg(count("*").as("n_total"))
      .join(kept.groupBy("lang").agg(count("*").as("n_kept")), Seq("lang"), "left")
      .select(col("lang"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Quota-pack docs into 256-token training sequences per source. */
  private def corpusPack(s: SparkSession, dir: String): DataFrame =
    Curation.packSequences(t(s, dir, "documents"), budget = 256)

  /** Budget-constrained sqrt-smoothed training mix: 10k-token budget across sources. */
  private def corpusMix(s: SparkSession, dir: String): DataFrame =
    Curation.budgetMix(t(s, dir, "documents"), budgetTokens = 10000L)

  /**
   * Temperature-τ mixture (τ=0.3, flatter than sqrt): the standard
   * multilingual/multi-source rebalancing lever (alloc ∝ t^τ). Same
   * round6-before-floor discretization discipline as corpus_mix.
   */
  private def corpusMixTemp(s: SparkSession, dir: String): DataFrame =
    Curation.budgetMix(t(s, dir, "documents"), budgetTokens = 10000L,
      temperature = 0.3)

  /**
   * Fractional-repetition rebalance toward uniform per-source token
   * budgets (Curation.upsampleMix): at 26k budget over 20 sources the
   * fixture's small sources repeat (rate > 1) while the large ones
   * thin (rate < 1), exercising both regimes of the md5 remainder
   * gate. Aggregated over the EXPLODED copies, so the oracle replays
   * the per-doc repeat count arithmetic exactly.
   */
  private def corpusUpsample(s: SparkSession, dir: String): DataFrame =
    Curation.upsampleMix(t(s, dir, "documents"), budgetTokens = 26000L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_rows_out"),
        sum("ntok").as("tokens_out"),
        countDistinct(col("id")).as("n_docs"))

  /** Symmetric int8 embedding quantization: norm/scale/checksums per vector. */
  /**
   * Vector-ingest quality gate: the embedding-table counterpart of
   * [[Checks]]' row constraints — dimensionality consistency, norm
   * bounds, non-finite detection, and DEAD-DIMENSION census (per-dim
   * variance < 1e-9, from the same O(d²) [[Similarity.momentState]]
   * the PCA family maintains — no extra corpus pass shape). One row
   * out; every stat oracled.
   */
  private def embQuality(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    val v = col("embedding").cast("array<double>")
    val perVec = embs.select(size(v).as("dims"),
      sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x)).as("norm"),
      exists(v, x => isnan(x) || x === Double.PositiveInfinity ||
        x === Double.NegativeInfinity).as("bad"))
    val base = perVec.agg(count(lit(1)).as("n_vecs"),
      countDistinct(col("dims")).as("n_dim_variants"),
      round(min(col("norm")), 4).as("min_norm"),
      round(max(col("norm")), 4).as("max_norm"),
      sum(col("bad").cast("long")).as("n_nonfinite"))
    // the dead-dim variance census only makes sense at ONE dimension;
    // a dim-inconsistent corpus (n_dim_variants > 1) restricts the
    // moment fit to the dominant dim — MomentAgg itself now refuses
    // ragged input loudly rather than corrupting Σxxᵀ offsets
    val domDim = embs.groupBy(size(v).as("dims")).count()
      .orderBy(col("count").desc, col("dims")).head().getInt(0)
    val st = Similarity.momentState(embs.filter(size(v) === domDim)).head()
    val sx = st.getSeq[Double](1).toArray
    val sxx = st.getSeq[Double](2).toArray
    val n = st.getLong(0).toDouble
    val d = sx.length
    val dead = (0 until d).count(i =>
      sxx(i * d + i) / n - (sx(i) / n) * (sx(i) / n) < 1e-9).toLong
    base.withColumn("n_dead_dims", lit(dead))
  }

  private def embQuantize(s: SparkSession, dir: String): DataFrame =
    Curation.quantizeEmbeddings(t(s, dir, "embeddings"))

  private def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.attachBinary(t(s, dir, "documents"))
      .select(col("doc_id"), col("meta.mime").as("mime"), col("meta.n_bytes").as("n_bytes"))

  private def multimodalDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeStub(Multimodal.attachBinary(t(s, dir, "documents")))

  /**
   * REAL codec round trip (no stub): deterministic grayscale PNGs are
   * encoded with javax.imageio (actual compressed PNG bytes), then
   * decoded by the shipped [[Multimodal.ImageIoDecoder]] — decoded
   * geometry and pixel sum must equal the closed-form truth the
   * oracle computes from (doc_id, w, h) alone, so the oracle needs no
   * codec while the engine exercises a true compress→decompress pass.
   */
  private def multimodalImageio(s: SparkSession, dir: String): DataFrame = {
    val withBin = t(s, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        Multimodal.encodePng(col("doc_id"),
          (col("doc_id") % 8 + 1).cast("int"),
          (col("doc_id") % 5 + 1).cast("int")).as("payload"))
    Multimodal.decodeImages(withBin)
  }

  /**
   * Per-payload 64-bit perceptual hash (block-mean phash, every bit
   * oracle-replayed) — the fixture has no byte-level near-dups
   * (min pairwise hamming 9), so the census is the oracled surface;
   * the pair path (band blocking + hamming verify, exact recall ≤ 3
   * by pigeonhole) is pinned on planted dups in OperatorsSpec.
   */
  private def multimodalPhash(s: SparkSession, dir: String): DataFrame =
    Multimodal.attachBinary(t(s, dir, "documents"))
      .select(col("doc_id"),
        graft.functions.VectorFunctions.phash64(col("payload")).as("ph"))

  /** Resize (every-2nd-byte downsample) with updated metadata, content-hashed. */
  private def multimodalResize(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizeStub(Multimodal.attachBinary(t(s, dir, "documents")), factor = 2)
      .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"), md5(col("payload")).as("payload_md5"))

  /** Full multimodal→vector→ANN chain: byte_embed features, brute-force top-3. */
  private def multimodalEmbed(s: SparkSession, dir: String): DataFrame = {
    val embedded = Multimodal.embedStub(Multimodal.attachBinary(t(s, dir, "documents")))
    Similarity.bruteForceTopK(embedded, embedded.filter(col("doc_id") < 10), k = 3,
        vecCol = "embedding", idCol = "doc_id")
      .withColumn("rank", col("rank").cast("long"))
  }

  /**
   * Zone-map metadata pruning ([[graft.sources.ZoneMap]]): lineitem
   * written range-clustered on l_shipdate, per-file min/max zones
   * hoisted into a files-sized stats table, and a one-quarter range
   * query planned against the STATS — only intersecting files are
   * opened (asserted in PlanAuditSpec). Oracle: the same predicate
   * over the original table (the rewrite is content-preserving).
   */
  private def qZonemapPrune(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val path = rtPath(dir, "zonemap")
    // layout AND stats are the sink's artifacts, written once —
    // repeated runs (bench reps) measure the PRUNED QUERY: a
    // files-sized stats read + the surviving files, never the
    // full-table stats scan (which is exactly the cost a zone map
    // exists to avoid). The `_stats` dir is underscore-hidden, so
    // data reads of `path` never see it.
    if (!new java.io.File(s"$path/_stats/_SUCCESS").exists()) {
      graft.sources.FileIO.sortedRoundTrip(li, path, "l_shipdate", partitions = 16)
      graft.sources.ZoneMap.build(s, path, Seq("l_shipdate"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_stats")
    }
    val stats = s.read.parquet(s"$path/_stats")
    graft.sources.ZoneMap.prunedRead(s, stats, li.schema, "l_shipdate",
        to_timestamp(lit("1995-01-01")), to_timestamp(lit("1995-03-31")))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  /** C4/CCNet paragraph-level rewrite: dedup 15-token units corpus-wide, reassemble docs. */
  private def dedupParagraphs(s: SparkSession, dir: String): DataFrame =
    Dedup.paragraphDedup(t(s, dir, "documents"), width = 15)

  /**
   * Incremental paragraph rewrite against the persistent unit index
   * ([[graft.operators.Dedup.writeUnitIndex]]): the first 90% of the
   * corpus is indexed once; the arriving 10% is rewritten per-batch
   * (bucket-pruned index probe, batch-sized cost). Oracle: the
   * GLOBAL rewrite restricted to the batch — maintained ≡ rebuilt.
   */
  private def dedupParagraphsIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cut = (docs.agg(max("doc_id")).head.getLong(0) + 1L) * 9L / 10L
    if (!s.catalog.tableExists("graft_unit_idx"))
      Dedup.writeUnitIndex(docs.filter(col("doc_id") < cut), "graft_unit_idx")
    Dedup.paragraphDedupIncremental(docs.filter(col("doc_id") >= cut), "graft_unit_idx")
  }

  /**
   * Sorted-neighborhood ER over the same corrupted-parts fixture as
   * `er_editdist` — equality blocking misses a typo that lands in a
   * different block; sort order keeps it adjacent.
   */
  private def erSortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val base = part.select(col("p_partkey").as("id"), col("p_name").as("s"))
      .unionByName(part.filter(col("p_partkey") % 100 === 0)
        .select((col("p_partkey") + 1000000).as("id"),
          concat(expr("substring(p_name, 1, length(p_name) - 1)"), lit("x")).as("s")))
    Dedup.sortedNeighborhoodPairs(base, "s", "id", w = 10, maxDist = 2)
  }

  /**
   * Declarative data-quality gate ([[graft.operators.Checks]]) over
   * orders with planted corruption (every 500th order re-appended
   * with negated price, unknown status, orphan custkey): four row
   * constraints in ONE scan, uniqueness as its own keyed aggregate,
   * referential integrity as an anti-join count.
   */
  private def qConstraints(s: SparkSession, dir: String): DataFrame = {
    val orders0 = t(s, dir, "orders")
    val bad = orders0.filter(col("o_orderkey") % 500 === 0)
      .withColumn("o_totalprice", -col("o_totalprice"))
      .withColumn("o_orderstatus", lit("X"))
      .withColumn("o_custkey", col("o_custkey") + 900000000L)
    val orders = orders0.unionByName(bad)
    Checks.report(
      Checks.rowChecks(orders, Seq(
        "o_custkey_not_null" -> col("o_custkey").isNotNull,
        "o_orderdate_in_window" -> col("o_orderdate").between(
          to_timestamp(lit("1990-01-01")), to_timestamp(lit("2000-12-31"))),
        "o_orderstatus_accepted" -> col("o_orderstatus").isin("O", "F", "P"),
        "o_totalprice_nonneg" -> (col("o_totalprice") >= 0))),
      Checks.uniqueCheck(orders, "o_orderkey_unique", Seq("o_orderkey")),
      Checks.foreignKeyCheck(orders, "o_custkey_fk_customer", "o_custkey",
        t(s, dir, "customer"), "c_custkey"))
  }

  /**
   * Corpus datasheet ("datasheets for datasets"): the one-row-per-
   * source release card — volume, exact-dup rate, mean quality,
   * language share, PII exposure — composed entirely from scan-stage
   * columns plus one keyed aggregate (the only extra exchange is the
   * single exact text-hash distinct, the semantic the card
   * requires). The fixture's PII count is honestly zero: the corpus
   * is clean, and the column proves the detector ran.
   */
  private def corpusDatasheet(s: SparkSession, dir: String): DataFrame = {
    val toks = size(split(lower(col("text")), " "))
    val piiHits = regexp_count(col("text"), lit("[a-z0-9._]+@[a-z0-9.]+[a-z]")) +
      regexp_count(col("text"), lit("[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+")) +
      regexp_count(col("text"), lit("[0-9]{3}-[0-9]{4}"))
    t(s, dir, "documents")
      .withColumn("_q", TextAnalysis.qualityCol(col("text")))
      .withColumn("_lang", TextAnalysis.predLangCol(col("text")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(toks).cast("long").as("n_tokens"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"),
        round(lit(1.0) - countDistinct(md5(col("text"))) / count(lit(1)), 4).as("dup_rate"),
        round(avg(col("_q")), 4).as("mean_quality"),
        round(sum(when(col("_lang") === "en", 1).otherwise(0)) / count(lit(1)), 4)
          .as("en_share"),
        sum(when(piiHits > 0, 1L).otherwise(0L)).as("pii_docs"))
  }

  /**
   * Split-leakage audit — the ML-hygiene check behind "dedup before
   * you split": near-dup PAIRS that straddle a train/test boundary
   * leak test content into training. Splitting by the document's own
   * id leaks (counted); splitting every doc by its near-dup CLUSTER
   * representative cannot (a pair's endpoints share a cluster by
   * construction — its leak count is the mechanism's proof). One
   * row: (n_pairs, leaked_doc_split, leaked_cluster_split).
   */
  private def corpusSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    def splitOf(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val bucket = md5lo64(concat(lit("split:"), k.cast("string")))
        .bitwiseAND(lit(16383L)) % 10
      when(bucket <= 7, "train").when(bucket === 8, "val").otherwise("test")
    }
    val docs = t(s, dir, "documents")
    // the pair set feeds BOTH the cluster build and the leakage joins
    // — materialize once or the shingle/jaccard generation runs twice
    val pairs = Dedup.ngramJaccardPairs(docs, n = 5, threshold = 0.7)
      .localCheckpoint()
    val clusters = Dedup.dupClusters(pairs)
    pairs
      .join(clusters.select(col("doc_id").as("a_id"), col("cluster_id").as("c_a")), "a_id")
      .join(clusters.select(col("doc_id").as("b_id"), col("cluster_id").as("c_b")), "b_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(splitOf(col("a_id")) =!= splitOf(col("b_id")), 1L).otherwise(0L))
          .as("leaked_doc_split"),
        sum(when(splitOf(col("c_a")) =!= splitOf(col("c_b")), 1L).otherwise(0L))
          .as("leaked_cluster_split"))
  }

  /**
   * k-anonymity audit ([[graft.operators.Checks.kAnonymity]]): the
   * under-k census over a quasi-identifier pair — every listed tuple
   * is a re-identification exposure to suppress or generalize before
   * the corpus ships.
   */
  private def qKAnonymity(s: SparkSession, dir: String): DataFrame =
    Checks.kAnonymityGroups(t(s, dir, "customer"),
      Seq("c_nationkey", "c_mktsegment"), k = 8)

  /**
   * l-diversity audit: quasi-id groups whose sensitive attribute
   * (account-balance sign band) is homogeneous — a k-crowd that all
   * shares one sensitive value still leaks it.
   */
  private def qLDiversity(s: SparkSession, dir: String): DataFrame =
    Checks.lDiversityGroups(
      t(s, dir, "customer")
        .withColumn("bal_band", when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "low").otherwise("high")),
      Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 3)

  /**
   * t-closeness audit (Checks.tClosenessGroups): the skewness-attack
   * rung of the privacy trio — quasi-id groups whose ordered
   * account-balance-band distribution diverges from the global one
   * by EMD > 0.2. Everything runs on bounded count tables; the
   * cumulative window walks the (groups × bands) grid in band order
   * on both engines, so the replay is bit-stable.
   */
  private def qTCloseness(s: SparkSession, dir: String): DataFrame =
    Checks.tClosenessGroups(
      t(s, dir, "customer")
        .withColumn("bal_band", floor(col("c_acctbal") / 2000).cast("long")),
      Seq("c_nationkey", "c_mktsegment"), "bal_band", t = 0.2)

  /**
   * Index DELETE maintenance: docs with doc_id % 7 == 5 are
   * tombstoned out of the built index (O(markers) append — no
   * rebuild, no corpus rescan) and must vanish from the next batch's
   * candidates. Oracle: the exhaustive batch×corpus pairs minus the
   * deleted corpus docs.
   */
  private def dedupIndexDelete(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cut = (docs.agg(max("doc_id")).head.getLong(0) + 1L) * 9L / 10L
    if (!s.catalog.tableExists("graft_dedup_idxd_bands"))
      Dedup.writeMinhashIndex(docs.filter(col("doc_id") < cut), "graft_dedup_idxd")
    if (!s.catalog.tableExists("graft_dedup_idxd_tombstones"))
      Dedup.deleteFromMinhashIndex(
        docs.filter(col("doc_id") < cut && col("doc_id") % 7 === 5),
        "graft_dedup_idxd")
    Dedup.indexedNearDupPairs(docs.filter(col("doc_id") >= cut), "graft_dedup_idxd")
  }

  /**
   * Vector-index DELETE maintenance: tombstoned vectors (vec_id % 7
   * == 3) drop out of the persisted IVF-PQ index's answers under the
   * frozen quantizer (trained on the full corpus — deletes never
   * retrain). Oracle: the IVF-PQ replay with the deleted ids excluded
   * from candidates only.
   */
  private def annIndexDelete(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
    if (!s.catalog.tableExists("graft_ann_idxd_codes"))
      Similarity.writeAnnIndex(embs, "graft_ann_idxd")
    if (!s.catalog.tableExists("graft_ann_idxd_tombstones"))
      Similarity.deleteFromAnnIndex(embs.filter(col("vec_id") % 7 === 3),
        "graft_ann_idxd")
    Similarity.annIndexTopK(embs.filter(col("vec_id") < 10), "graft_ann_idxd")
  }

  // ---------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // pipeline parity
    "lmr_count" -> (lmrCount _),
    "lmr_filter_map" -> (lmrFilterMap _),
    "lmr_reshuffle_etl" -> (lmrReshuffleEtl _),
    "lmr_dbsize" -> (lmrDbsize _),
    "lmr_error_channel" -> (lmrErrorChannel _),
    "q_internal_command" -> (qInternalCommand _),
    "q_info" -> (qInfo _),
    // relational gap table
    "q1_pricing" -> (q1Pricing _),
    "q3_topk_revenue" -> (q3TopkRevenue _),
    "q5_nation_revenue" -> (q5NationRevenue _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q8_market_share" -> (q8MarketShare _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q12_late_shipments" -> (q12LateShipments _),
    "q14_promo_share" -> (q14PromoShare _),
    "q4_priority_check" -> (q4PriorityCheck _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q13_order_distribution" -> (q13OrderDistribution _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q19_brand_promo" -> (q19BrandPromo _),
    "q21_waiting_supplier" -> (q21WaitingSupplier _),
    "q22_idle_customers" -> (q22IdleCustomers _),
    // partsupp tier (derived table, dbgen assignment formula)
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q11_important_stock" -> (q11ImportantStock _),
    "q16_parts_supplier_cnt" -> (q16PartsSupplierCnt _),
    "q20_stocked_promo_suppliers" -> (q20StockedPromoSuppliers _),
    "q_window_latest_orders" -> (qWindowLatestOrders _),
    "q_rollup" -> (qRollup _),
    "q_intersect" -> (qIntersect _),
    "q_except" -> (qExcept _),
    "q_anti_join" -> (qAntiJoin _),
    "q_semi_join" -> (qSemiJoin _),
    "q_scalar_funcs" -> (qScalarFuncs _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_distinct_agg" -> (qDistinctAgg _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_topk_custom" -> (qTopkCustom _),
    "q_keys_source" -> (qKeysSource _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_subqueries" -> (qSubqueries _),
    "q_udaf_weighted" -> (qUdafWeighted _),
    "q_array_agg" -> (qArrayAgg _),
    "q_cumulative" -> (qCumulative _),
    "q_range_band" -> (qRangeBand _),
    "q_union_paging" -> (qUnionPaging _),
    "q_json_extract" -> (qJsonExtract _),
    "q_outer_join" -> (qOuterJoin _),
    "q_cube" -> (qCube _),
    "q_string_match" -> (qStringMatch _),
    "q_date_arith" -> (qDateArith _),
    "q_asof_join" -> (qAsofJoin _),
    "q_percentile" -> (qPercentile _),
    "q_percentile_approx" -> (qPercentileApprox _),
    "q_pivot" -> (qPivot _),
    "q_sample_hash" -> (qSampleHash _),
    "q_rank_variants" -> (qRankVariants _),
    "q_corr_stats" -> (qCorrStats _),
    "q_conditional_agg" -> (qConditionalAgg _),
    "q_events_window" -> (qEventsWindow _),
    "q_sessionize" -> (qSessionize _),
    "q_scd2" -> (qScd2 _),
    "q_dim_lookup" -> (qDimLookup _),
    "corpus_domain_cap" -> (corpusDomainCap _),
    "corpus_domain_token_cap" -> (corpusDomainTokenCap _),
    "corpus_epoch_shuffle" -> (corpusEpochShuffle _),
    "corpus_curriculum" -> (corpusCurriculum _),
    "pipeline_train_prep" -> (pipelineTrainPrep _),
    "text_keywords" -> (textKeywords _),
    "q_event_cohorts" -> (qEventCohorts _),
    "q_attribution" -> (qAttribution _),
    "stream_sessions" -> (qStreamSessions _),
    "stream_topk" -> (qStreamTopk _),
    "stream_cms" -> (qStreamCms _),
    "stream_kmv" -> (qStreamKmv _),
    "stream_zscore" -> (qStreamZscore _),
    "stream_click_purchase" -> (qClickToPurchase _),
    "stream_unconverted" -> (qStreamUnconverted _),
    "stream_user_stats" -> (qUserStatsTws _),
    "stream_dedup" -> (qStreamDedup _),
    "stream_curate" -> (qStreamCurate _),
    "q_crc16_slots" -> (qCrc16Slots _),
    "q_explode_tokens" -> (qExplodeTokens _),
    "q_ntile_cume" -> (qNtileCume _),
    "q_minmax_by" -> (qMinmaxBy _),
    "q_regexp_extract" -> (qRegexpExtract _),
    "q_array_lambda" -> (qArrayLambda _),
    "q_map_funcs" -> (qMapFuncs _),
    "q_window_range" -> (qWindowRange _),
    "q_point_lookup" -> (qPointLookup _),
    "q_skew_salted" -> (qSkewSalted _),
    "q_bloom_join" -> (qBloomJoin _),
    "q_gap_fill" -> (qGapFill _),
    "q_histogram" -> (qHistogram _),
    "q_bitwise_agg" -> (qBitwiseAgg _),
    "q_csv_roundtrip" -> (qCsvRoundtrip _),
    "q_orc_roundtrip" -> (qOrcRoundtrip _),
    "q_schema_evolution" -> (qSchemaEvolution _),
    "q_sorted_sink" -> (qSortedSink _),
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_segment_pruned" -> (qSegmentPruned _),
    "q_segment_pruned_auto" -> (qSegmentPrunedAuto _),
    "q_time_travel" -> (qTimeTravel _),
    "q_segment_feed" -> (qSegmentFeed _),
    "q_json_roundtrip" -> (qJsonRoundtrip _),
    "q_jdbc_roundtrip" -> (qJdbcRoundtrip _),
    "q_partitioned_sink" -> (qPartitionedSink _),
    "q_variant" -> (qVariant _),
    "q_lateral" -> (qLateral _),
    "q_unpivot" -> (qUnpivot _),
    // north-star LLM ops
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_containment" -> (dedupContainment _),
    "dedup_bloom_gate" -> (dedupBloomGate _),
    "dedup_clusters" -> (dedupClusters _),
    "dedup_clusters_big" -> (dedupClustersBig _),
    "dedup_clusters_incr" -> (dedupClustersIncr _),
    "q_recursive_cte" -> (qRecursiveCte _),
    "dedup_corpus" -> (dedupCorpus _),
    "pipeline_filter" -> (pipelineFilter _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_minhash_sql" -> (dedupMinhashSql _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embedding" -> (dedupEmbedding _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_index_incremental" -> (dedupIndexIncremental _),
    "dedup_index_append" -> (dedupIndexAppend _),
    "dedup_bloom_persist" -> (dedupBloomPersist _),
    "dedup_semantic" -> (dedupSemantic _),
    "dedup_spans" -> (dedupSpans _),
    "dedup_span_rewrite" -> (dedupSpanRewrite _),
    "dedup_span_rewrite_incr" -> (dedupSpanRewriteIncr _),
    "dedup_span_rewrite_del" -> (dedupSpanRewriteDel _),
    "dedup_paragraphs_del" -> (dedupParagraphsDel _),
    "text_importance" -> (textImportance _),
    "text_bm25" -> (textBm25 _),
    "retrieval_ndcg" -> (retrievalNdcg _),
    "retrieval_metrics" -> (retrievalMetrics _),
    "retrieval_rrf" -> (retrievalRrf _),
    "text_bpe_pairs" -> (textBpePairs _),
    "text_bpe_apply" -> (textBpeApply _),
    "text_bpe_iterative" -> (textBpeIterative _),
    "text_bpe_batched" -> (textBpeBatched _),
    "text_bpe_table" -> (textBpeTable _),
    "stream_enrich" -> (qStreamEnrich _),
    "stream_funnel" -> (qStreamFunnel _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_cms_topk" -> (qCmsTopk _),
    "graph_pagerank" -> (graphPagerank _),
    "graph_ppr" -> (graphPPR _),
    "graph_sssp" -> (graphSssp _),
    "graph_sssp_converged" -> (graphSsspConverged _),
    "graph_triangles" -> (graphTriangles _),
    "graph_communities" -> (graphCommunities _),
    "graph_degrees" -> (graphDegrees _),
    "graph_assortativity" -> (graphAssortativity _),
    "graph_clustering" -> (graphClustering _),
    "graph_coreness" -> (graphCoreness _),
    "graph_harmonic" -> (graphHarmonic _),
    "graph_kcore" -> (graphKcore _),
    "graph_ktruss" -> (graphKtruss _),
    "graph_modularity" -> (graphModularity _),
    "graph_bfs" -> (graphBfs _),
    "q_event_pattern" -> (qEventPattern _),
    "emb_pca" -> (embPca _),
    "emb_quality" -> (embQuality _),
    "emb_pca_delete" -> (embPcaDelete _),
    "emb_pca_incr" -> (embPcaIncr _),
    "emb_pca_whiten" -> (embPcaWhiten _),
    "emb_project" -> (embProject _),
    "emb_recall" -> (embRecall _),
    "emb_kmeans" -> (embKmeans _),
    "emb_cluster_sample" -> (embClusterSample _),
    "emb_silhouette" -> (embSilhouette _),
    "text_vocab_coverage" -> (textVocabCoverage _),
    "emb_pq" -> (embPq _),
    "ann_pq" -> (annPq _),
    "ann_recall_pq" -> (annRecallPq _),
    "ann_filtered" -> (annFiltered _),
    "ann_ivfpq" -> (annIvfPq _),
    "ann_index_persisted" -> (annIndexPersisted _),
    "ann_index_filtered" -> (annIndexFiltered _),
    "ann_index_append" -> (annIndexAppend _),
    "ann_drift_residual" -> (annDriftResidual _),
    "ann_index_requantize" -> (annIndexRequantize _),
    "ann_pq_error" -> (annPqError _),
    "ann_index_epoch" -> (annIndexEpoch _),
    "q_zorder_sink" -> (qZorderSink _),
    "ann_bruteforce" -> (annBruteforce _),
    "ann_mmr" -> (annMmr _),
    "ann_centroid" -> (annCentroid _),
    "ann_lsh" -> (annLsh _),
    "ann_multiprobe" -> (annMultiprobe _),
    "ann_ivf" -> (annIvf _),
    "text_quality" -> (textQuality _),
    "text_quality_mad" -> (textQualityMad _),
    "text_langid" -> (textLangid _),
    "text_langid_confusion" -> (textLangidConfusion _),
    "text_tokens" -> (textTokens _),
    "text_fingerprint" -> (textFingerprint _),
    "text_winnow" -> (textWinnow _),
    "text_zipf" -> (textZipf _),
    "dedup_winnow" -> (dedupWinnow _),
    "text_bigram_lm" -> (textBigramLm _),
    "text_classify" -> (textClassify _),
    "text_calibration" -> (textCalibration _),
    "text_auc" -> (textAuc _),
    "text_classify_eval" -> (textClassifyEval _),
    "text_nb_classify" -> (textNbClassify _),
    "text_classify_table" -> (textClassifyTable _),
    "text_langid_table" -> (textLangidTable _),
    "dedup_keep_best" -> (dedupKeepBest _),
    "corpus_quality_topk" -> (corpusQualityTopk _),
    "text_dup_fraction" -> (textDupFraction _),
    "corpus_overlap_matrix" -> (corpusOverlapMatrix _),
    "text_entropy" -> (textEntropy _),
    "corpus_interleave" -> (corpusInterleave _),
    "corpus_source_kl" -> (corpusSourceKl _),
    "text_jaccard_knn" -> (textJaccardKnn _),
    "er_editdist" -> (erEditdist _),
    "er_fellegi_sunter" -> (erFellegiSunter _),
    "er_em_params" -> (erEmParams _),
    "pipeline_linkage" -> (pipelineLinkage _),
    "er_cosine" -> (erCosine _),
    "corpus_resample" -> (corpusResample _),
    "q_hll_union" -> (qHllUnion _),
    "q_profile" -> (qProfile _),
    "q_kmv_ops" -> (qKmvOps _),
    "q_sketch_quantiles" -> (qSketchQuantiles _),
    "corpus_split" -> (corpusSplit _),
    "corpus_split_stratified" -> (corpusSplitStratified _),
    "corpus_shard_manifest" -> (corpusShardManifest _),
    "q_observe_metrics" -> (qObserveMetrics _),
    "corpus_diff" -> (corpusDiff _),
    "corpus_weighted_sample" -> (corpusWeightedSample _),
    "corpus_incr_stats" -> (corpusIncrStats _),
    "corpus_apply_delta" -> (corpusApplyDelta _),
    // corpus curation (round 3)
    "text_decontaminate" -> (textDecontaminate _),
    "pipeline_decontaminate" -> (pipelineDecontaminate _),
    "text_decontaminate_fuzzy" -> (textDecontaminateFuzzy _),
    "text_lm_score" -> (textLmScore _),
    "text_ppl_buckets" -> (textPplBuckets _),
    "pipeline_ccnet" -> (pipelineCcnet _),
    "pipeline_ingest" -> (pipelineIngest _),
    "text_gopher_census" -> (textGopherCensus _),
    "text_lm_heldout" -> (textLmHeldout _),
    "text_chunks" -> (textChunks _),
    "text_repetition" -> (textRepetition _),
    "text_redact" -> (textRedact _),
    "corpus_sample" -> (corpusSample _),
    "corpus_bottomk" -> (corpusBottomK _),
    "corpus_pack" -> (corpusPack _),
    "corpus_mix" -> (corpusMix _),
    "corpus_mix_temp" -> (corpusMixTemp _),
    "corpus_upsample" -> (corpusUpsample _),
    "emb_quantize" -> (embQuantize _),
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_imageio" -> (multimodalImageio _),
    "multimodal_resize_real" -> (multimodalResizeReal _),
    "multimodal_image_phash" -> (multimodalImagePhash _),
    "multimodal_phash" -> (multimodalPhash _),
    "multimodal_frames" -> (qMultimodalFrames _),
    "multimodal_embed" -> (multimodalEmbed _),
    "multimodal_resize" -> (multimodalResize _),
    // warehouse + curation closures (round 5 continuation)
    "q_zonemap_prune" -> (qZonemapPrune _),
    "dedup_paragraphs" -> (dedupParagraphs _),
    "er_sorted_neighborhood" -> (erSortedNeighborhood _),
    "q_constraints" -> (qConstraints _),
    "dedup_index_delete" -> (dedupIndexDelete _),
    "ann_index_delete" -> (annIndexDelete _),
    "q_keys_minmax" -> (qKeysMinmax _),
    "q_keys_groupcount" -> (qKeysGroupcount _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_l_diversity" -> (qLDiversity _),
    "q_t_closeness" -> (qTCloseness _),
    "corpus_split_leakage" -> (corpusSplitLeakage _),
    "corpus_datasheet" -> (corpusDatasheet _),
    "q_zonemap_zorder" -> (qZonemapZorder _),
    "dedup_paragraphs_incr" -> (dedupParagraphsIncr _),
  )

  // ---------------------------------------------------------------------------
  // Oracle-SQL building blocks for the cross-engine-hash queries
  // ---------------------------------------------------------------------------

  /** DuckDB: unsigned 64-bit value of the first 16 hex chars of md5(e). */
  private def md5u(e: String): String = s"(('0x'||substr(md5($e),1,16))::UBIGINT)"

  /**
   * Fellegi–Sunter field weights, precomputed to round6'd literals so
   * BOTH engines sum identical constants (ln() implementations may
   * differ in the last ulp): (agreeWeight, disagreeWeight).
   */
  private def fsWeights(m: Double, u: Double): (Double, Double) = {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (r6(math.log(m / u)), r6(math.log((1 - m) / (1 - u))))
  }
  private lazy val fsFields: Seq[(String, Double, Double)] = Seq(
    ("bal_band", fsWeights(0.9, 0.05)),
    ("name_tail", fsWeights(0.85, 0.2)),
    ("cent_band", fsWeights(0.8, 0.1))).map { case (f, (wa, wd)) => (f, wa, wd) }

  /**
   * Winnowing fingerprint selection (k=4-gram, w=5 window) replayed
   * in DuckDB: k-gram md5lo64 hashes with the sign bit cleared (so
   * BIGINT min-ordering matches the engine), sliding-window minima,
   * distinct per doc — [[graft.operators.TextAnalysis.winnowFingerprints]].
   */
  private val winnowCte: String =
    "WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents), " +
      "hs AS (SELECT doc_id, [CAST((" + md5u("array_to_string(w[i:i+3], ' ')") +
      " & 9223372036854775807::UBIGINT) AS BIGINT) " +
      "for i in generate_series(1, greatest(len(w) - 3, 0))] AS h FROM tok), " +
      "fp AS (SELECT DISTINCT doc_id, f AS fp FROM hs, " +
      "UNNEST([list_min(h[j:j+4]) for j in generate_series(1, greatest(len(h) - 4, 0))]) " +
      "AS t(f)) "

  /** One BM25 term in the engine's exact operand order (k1=1.2, b=0.75). */
  private def bm25Term(idf: String, term: String): String = {
    val tf = s"len(list_filter(w, x -> x = '$term'))"
    s"$idf * ($tf * (1.2 + 1)) / ($tf + 1.2 * ((1 - 0.75) + 0.75 * len(w) / avgdl))"
  }

  /** One pagerank iteration `out` from `in` (d=0.85), as a chained CTE. */
  private def prIter(out: String, in: String): String =
    s"$out AS (SELECT dst AS node, (1 - 0.85) / cnt + 0.85 * sum(rank / outdeg) AS rank " +
      s"FROM e JOIN $in ON e.src = $in.node JOIN deg ON e.src = deg.src, n " +
      "GROUP BY dst, cnt), "

  /** One personalized-pagerank round: damped contribs + restart mass on seeds only. */
  private def pprIter(out: String, in: String): String =
    s"$out AS (SELECT coalesce(c.node, sd.node) AS node, " +
      "0.85 * coalesce(c.contrib, 0) + " +
      "CASE WHEN sd.node IS NOT NULL THEN 0.15 / ns.n_seeds ELSE 0 END AS rank " +
      s"FROM (SELECT e.dst AS node, sum(rank / outdeg) AS contrib " +
      s"FROM e JOIN $in ON e.src = $in.node JOIN deg ON e.src = deg.src " +
      "GROUP BY e.dst) c FULL OUTER JOIN sd ON c.node = sd.node, ns), "

  /** The Fellegi–Sunter posterior expression under the params row of CTE `in`. */
  private def emPost(in: String): String = {
    def num =
      s"($in.lambda * (CASE WHEN a0 = 1 THEN $in.m0 ELSE 1 - $in.m0 END) " +
        s"* (CASE WHEN a1 = 1 THEN $in.m1 ELSE 1 - $in.m1 END) " +
        s"* (CASE WHEN a2 = 1 THEN $in.m2 ELSE 1 - $in.m2 END))"
    def alt =
      s"((1 - $in.lambda) * (CASE WHEN a0 = 1 THEN $in.u0 ELSE 1 - $in.u0 END) " +
        s"* (CASE WHEN a1 = 1 THEN $in.u1 ELSE 1 - $in.u1 END) " +
        s"* (CASE WHEN a2 = 1 THEN $in.u2 ELSE 1 - $in.u2 END))"
    s"($num / ($num + $alt))"
  }

  /** One EM round as a chained CTE: E-step posterior, M-step ordered sums, round6. */
  private def emIter(out: String, in: String): String = {
    def ls(expr: String) = s"list_sum(list($expr ORDER BY a0, a1, a2))"
    s"$out AS (SELECT " +
      s"round(${ls("n * p")} / ${ls("n::DOUBLE")}, 6) AS lambda, " +
      (0 to 2).map { i =>
        s"round(${ls(s"n * p * a$i")} / ${ls("n * p")}, 6) AS m$i, " +
          s"round(${ls(s"n * (1 - p) * a$i")} / ${ls("n * (1 - p)")}, 6) AS u$i"
      }.mkString(", ") +
      s" FROM (SELECT combos.*, ${emPost(in)} AS p FROM combos, $in)), "
  }

  /** One Bellman–Ford relaxation round as a chained CTE: keep ∪ relax, min per node. */
  private def ssspIter(out: String, in: String): String =
    s"$out AS (SELECT node, min(dist) AS dist FROM (" +
      s"SELECT node, dist FROM $in UNION ALL " +
      s"SELECT ew.dst AS node, $in.dist + ew.w AS dist " +
      s"FROM ew JOIN $in ON ew.src = $in.node) GROUP BY node), "

  /** One label-propagation round as a chained CTE: neighbor-label mode, min-label ties. */
  private def lpRound(out: String, in: String): String =
    s"$out AS (SELECT node2 AS node, label FROM (" +
      "SELECT dst AS node2, label, row_number() OVER (PARTITION BY dst " +
      "ORDER BY cnt DESC, label) AS rn FROM (" +
      s"SELECT e.dst, i.label, count(*) AS cnt FROM e JOIN $in i ON e.src = i.node " +
      "GROUP BY e.dst, i.label)) WHERE rn = 1), "

  /** One k-means round as chained CTEs: mean centroids `c` from `in`, reassignment `out`. */
  private def kmRound(c: String, out: String, in: String): String =
    s"$c AS (SELECT cl, list(cv ORDER BY i) AS centroid FROM (" +
      s"SELECT cl, i, avg(v[i]) AS cv FROM $in, generate_series(1, 64) t(i) " +
      "GROUP BY cl, i) GROUP BY cl), " +
      s"$out AS (SELECT vec_id, v, cl FROM (" +
      s"SELECT x.vec_id, x.v, c.cl, row_number() OVER (PARTITION BY x.vec_id " +
      s"ORDER BY list_cosine_similarity(x.v, c.centroid) DESC, c.cl) AS rn " +
      s"FROM $in x, $c c) WHERE rn = 1), "

  /** DuckDB: two's-complement wrap of an unsigned 64-bit expression to signed BIGINT. */
  private def wrapSigned(u: String): String =
    s"(CASE WHEN $u >= 9223372036854775808::HUGEINT THEN (($u)::HUGEINT - " +
      s"18446744073709551616::HUGEINT)::BIGINT ELSE ($u)::BIGINT END)"

  /**
   * DuckDB: CRC16-CCITT of a string key, folding the same 256-entry
   * table as [[graft.core.Slots]] with `list_reduce` over the bytes.
   */
  private def crcSql(keyExpr: String): String = {
    val tab = graft.core.Slots.crcTable.mkString("[", ",", "]")
    s"list_reduce(list_prepend(0, [ord(substr($keyExpr, i, 1)) " +
      s"for i in generate_series(1, length($keyExpr))]), " +
      s"(crc, b) -> xor((crc << 8) & 65535, ($tab)[(xor(crc >> 8, b) & 255) + 1]))"
  }

  /** DSIR importance-weight replay (capped corpus LM + add-1 target LM, smoothed OOV). */
  private lazy val importanceSql: String =
    "WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok " +
      "FROM documents), " +
      "cf AS (SELECT tok, count(*) AS c_cnt FROM tok GROUP BY tok), " +
      "stats AS (SELECT sum(c_cnt) AS c_total, count(*) AS vocab_all FROM cf), " +
      "kept AS (SELECT tok, c_cnt FROM cf WHERE c_cnt >= 2 " +
      "QUALIFY row_number() OVER (ORDER BY c_cnt DESC, tok) <= 20), " +
      "ks AS (SELECT sum(c_cnt) AS kept_total, count(*) AS kept_types FROM kept), " +
      "ov AS (SELECT c_total, vocab_all, " +
      "(c_total - kept_total) / (vocab_all - kept_types) / c_total AS p_oov " +
      "FROM stats, ks), " +
      "tf AS (SELECT tok, count(*) AS t_cnt FROM tok WHERE doc_id % 50 = 0 " +
      "GROUP BY tok QUALIFY row_number() OVER (ORDER BY t_cnt DESC, tok) <= 20), " +
      "tt AS (SELECT sum(t_cnt) AS t_total FROM tf) " +
      "SELECT doc_id, count(*) AS n_tokens, " +
      "round(avg(ln((coalesce(t_cnt, 0) + 1) / (t_total + vocab_all)) " +
      "- (CASE WHEN c_cnt IS NOT NULL THEN ln(c_cnt / c_total) " +
      "ELSE ln(p_oov) END)), 4) AS importance " +
      "FROM tok LEFT JOIN kept USING (tok) LEFT JOIN tf USING (tok), ov, tt " +
      "GROUP BY doc_id"

  /**
   * Greedy MMR replay: the cosine top-20 pool for query vector 0,
   * then 5 chained pick-CTEs (λ=0.7, μ=0.3), each selecting the
   * argmax of 0.7·rel − 0.3·max-sim-to-selected with similarities
   * rounded to 6 decimals before the arithmetic — the identical
   * discipline as the engine's driver-side greedy loop.
   */
  private lazy val mmrSql: String = {
    val steps = (2 to 5).map { t =>
      val prev = s"sel${t - 1}"
      val pen = s"(SELECT max(round(list_cosine_similarity(r.v, s.v), 6)) FROM $prev s)"
      s"p$t AS (SELECT $t AS rank, r.id, r.v, r.rel, " +
        s"round(0.7 * r.rel - 0.3 * $pen, 6) AS sc " +
        s"FROM c20 r WHERE r.id NOT IN (SELECT id FROM $prev) " +
        s"ORDER BY 0.7 * r.rel - 0.3 * $pen DESC, r.id LIMIT 1), " +
        s"sel$t AS (SELECT id, v FROM $prev UNION ALL SELECT id, v FROM p$t), "
    }.mkString.dropRight(2)
    "WITH cand AS (SELECT c.vec_id AS id, c.embedding::DOUBLE[] AS v, " +
      "list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos, " +
      "row_number() OVER (ORDER BY " +
      "list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, " +
      "c.vec_id) AS rnk FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id " +
      "WHERE q.vec_id = 0), " +
      "c20 AS (SELECT id, v, round(cos, 6) AS rel FROM cand WHERE rnk <= 20), " +
      "p1 AS (SELECT 1 AS rank, id, v, rel, round(0.7 * rel, 6) AS sc FROM c20 " +
      "ORDER BY 0.7 * rel DESC, id LIMIT 1), " +
      "sel1 AS (SELECT id, v FROM p1), " + steps + " " +
      "SELECT CAST(rank AS BIGINT) AS rank, id AS vec_id, sc AS mmr FROM " +
      "(SELECT rank, id, sc FROM p1 UNION ALL SELECT rank, id, sc FROM p2 " +
      "UNION ALL SELECT rank, id, sc FROM p3 UNION ALL SELECT rank, id, sc FROM p4 " +
      "UNION ALL SELECT rank, id, sc FROM p5)"
  }

  /** Exhaustive exact n-gram-jaccard pair SQL — oracle for both the inverted-index and MinHash paths. */
  private val ngramJaccardSql: String =
    "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
      "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
      "pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter " +
      "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
      "SELECT a_id, b_id, round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard " +
      "FROM pairs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id " +
      "WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7"

  /**
   * [[Similarity.pcaProject]] oracle: covariance from the parquet,
   * then the SAME 20 power-iteration steps per component, fully
   * unrolled (20 × 64-row matvecs are trivial; recursive CTEs can't
   * aggregate their own reference), Hotelling deflation between
   * components, projection minus the mean offset.
   */
  private val pcaSql: String = pcaSqlBody(whiten = false)
  private val pcaWhitenSql: String = pcaSqlBody(whiten = true)
  private val pcaDeleteSql: String = pcaSqlBody(whiten = false,
    where = " WHERE vec_id <= (SELECT max(vec_id) // 2 FROM embeddings)")

  private def pcaSqlBody(whiten: Boolean, where: String = ""): String = {
    // every CTE MATERIALIZED: DuckDB inlines plain CTEs, and the
    // 20-deep v→m→cov→…→v chain would duplicate the upstream parquet
    // scan exponentially (observed as an fd-exhaustion error)
    def steps(pre: String, covName: String, start: Int): String = {
      val v0 = s"${pre}v0 AS MATERIALIZED (SELECT i, " +
        s"CASE WHEN i = $start THEN 1.0 ELSE 0.0 END " +
        "AS x FROM generate_series(1, 64) t(i))"
      val its = (1 to 20).map { st =>
        s"${pre}m$st AS MATERIALIZED (SELECT c.i, sum(c.cij * v.x) AS x " +
          s"FROM $covName c " +
          s"JOIN ${pre}v${st - 1} v ON c.j = v.i GROUP BY c.i), " +
          s"${pre}v$st AS MATERIALIZED (SELECT i, " +
          s"x / sqrt((SELECT sum(x * x) FROM ${pre}m$st)) " +
          s"AS x FROM ${pre}m$st)"
      }.mkString(", ")
      s"$v0, $its"
    }
    "WITH v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v " +
      s"FROM embeddings$where), " +
      "nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM v), " +
      "mean AS MATERIALIZED (SELECT i, sum(v[i]) / (SELECT n FROM nn) AS m " +
      "FROM v, generate_series(1, 64) t(i) GROUP BY i), " +
      "sxx AS MATERIALIZED (SELECT a.i AS i, b.j AS j, " +
      "sum(x.v[a.i] * x.v[b.j]) AS s " +
      "FROM v x, generate_series(1, 64) a(i), generate_series(1, 64) b(j) " +
      "GROUP BY 1, 2), " +
      "cov AS MATERIALIZED (SELECT s.i, s.j, " +
      "s.s / (SELECT n FROM nn) - ma.m * mb.m AS cij " +
      "FROM sxx s JOIN mean ma ON ma.i = s.i JOIN mean mb ON mb.i = s.j), " +
      steps("a", "cov", 1) + ", " +
      "lam1 AS MATERIALIZED (SELECT sum(v.x * m.x) AS l FROM av20 v JOIN " +
      "(SELECT c.i, sum(c.cij * w.x) AS x FROM cov c JOIN av20 w ON c.j = w.i " +
      "GROUP BY c.i) m ON v.i = m.i), " +
      "cov2 AS MATERIALIZED (SELECT c.i, c.j, " +
      "c.cij - (SELECT l FROM lam1) * a.x * b.x AS cij " +
      "FROM cov c JOIN av20 a ON a.i = c.i JOIN av20 b ON b.i = c.j), " +
      steps("b", "cov2", 2) + ", " +
      "lam2 AS MATERIALIZED (SELECT sum(v.x * m.x) AS l FROM bv20 v JOIN " +
      "(SELECT c.i, sum(c.cij * w.x) AS x FROM cov2 c JOIN bv20 w ON c.j = w.i " +
      "GROUP BY c.i) m ON v.i = m.i), " +
      "w1 AS MATERIALIZED (SELECT list(x ORDER BY i) AS w FROM av20), " +
      "w2 AS MATERIALIZED (SELECT list(x ORDER BY i) AS w FROM bv20), " +
      "o1 AS MATERIALIZED (SELECT sum(m.m * v.x) AS o " +
      "FROM mean m JOIN av20 v ON m.i = v.i), " +
      "o2 AS MATERIALIZED (SELECT sum(m.m * v.x) AS o " +
      "FROM mean m JOIN bv20 v ON m.i = v.i) " +
      "SELECT vec_id, " +
      // + 0.0 after round: normalize -0.0 → +0.0 (matches the engine)
      (if (whiten)
        "round((list_dot_product(x.v, (SELECT w FROM w1)) - (SELECT o FROM o1)) " +
          "/ sqrt((SELECT l FROM lam1)), 4) + 0.0 AS p0, " +
          "round((list_dot_product(x.v, (SELECT w FROM w2)) - (SELECT o FROM o2)) " +
          "/ sqrt((SELECT l FROM lam2)), 4) + 0.0 AS p1 "
      else
        "round(list_dot_product(x.v, (SELECT w FROM w1)) - (SELECT o FROM o1), 4) + 0.0 AS p0, " +
          "round(list_dot_product(x.v, (SELECT w FROM w2)) - (SELECT o FROM o2), 4) + 0.0 AS p1 ") +
      "FROM v x"
  }

  /**
   * IVF-PQ oracle, parameterized by the quantizer's TRAINING SET
   * (`trainFilter` restricts the vectors that derive the coarse
   * centroids and PQ codebooks; assignment/encoding/search always
   * cover the full corpus). Empty filter ⇒ train on everything —
   * the ann_ivfpq / ann_index_persisted case; a vec_id cut ⇒ the
   * frozen-quantizer append case (ann_index_append).
   */
  private def ivfPqSql(trainFilter: String, candJoin: String = "",
      refineRounds: Int = 0): String =
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      s"tv AS (SELECT * FROM v $trainFilter), " +
      (if (refineRounds == 0)
        "d AS (SELECT vec_id % 32 AS _b, i, avg(v[i]) AS cv FROM tv, " +
          "generate_series(1, 64) t(i) GROUP BY 1, 2), " +
          "cent AS (SELECT _b, list(cv ORDER BY i) AS centroid FROM d GROUP BY _b), "
      else
        // Lloyd-refined coarse quantizer (requantizeAnnIndex): the
        // emb_kmeans round CTEs seeded at vec_id % 32, final
        // centroids = means of the last reassignment
        "ra0 AS (SELECT vec_id, v, vec_id % 32 AS cl FROM tv), " +
          (1 to refineRounds).map(r =>
            kmRound(s"rc$r", s"ra$r", s"ra${r - 1}")).mkString +
          "cent AS (SELECT cl AS _b, list(cv ORDER BY i) AS centroid FROM (" +
          s"SELECT cl, i, avg(v[i]) AS cv FROM ra$refineRounds, " +
          "generate_series(1, 64) t(i) GROUP BY cl, i) GROUP BY cl), ") +
      "assign AS (SELECT vec_id, _b FROM (" +
      "SELECT x.vec_id, ct._b, row_number() OVER (PARTITION BY x.vec_id " +
      "ORDER BY list_cosine_similarity(x.v, ct.centroid) DESC, ct._b) AS rn " +
      "FROM v x, cent ct) WHERE rn = 1), " +
      "probes AS (SELECT vec_id AS query_id, v AS qv, _b FROM (" +
      "SELECT x.vec_id, x.v, ct._b, row_number() OVER (PARTITION BY x.vec_id " +
      "ORDER BY list_cosine_similarity(x.v, ct.centroid) DESC, ct._b) AS rn " +
      "FROM v x, cent ct WHERE x.vec_id < 10) WHERE rn <= 8), " +
      "pcent AS (SELECT vec_id % 16 AS b, i, avg(v[i]) AS c FROM tv, " +
      "generate_series(1, 64) t(i) GROUP BY 1, 2), " +
      "pd AS (SELECT x.vec_id, (t.i - 1) // 8 AS j, ce.b, " +
      "sum((x.v[t.i] - ce.c) * (x.v[t.i] - ce.c)) AS d2 " +
      "FROM v x, generate_series(1, 64) t(i) JOIN pcent ce ON ce.i = t.i " +
      "GROUP BY 1, 2, ce.b), " +
      "pbest AS (SELECT vec_id, j, b, row_number() OVER " +
      "(PARTITION BY vec_id, j ORDER BY d2, b) AS rn FROM pd), " +
      "code AS (SELECT vec_id, j, b FROM pbest WHERE rn = 1), " +
      "qd AS (SELECT p.query_id, a.vec_id AS neighbor_id, " +
      "sum((p.qv[t.i] - ce.c) * (p.qv[t.i] - ce.c)) AS raw " +
      "FROM probes p JOIN assign a ON p._b = a._b AND a.vec_id != p.query_id " +
      candJoin +
      "JOIN code co ON co.vec_id = a.vec_id " +
      "JOIN pcent ce ON ce.b = co.b, generate_series(1, 64) t(i) " +
      "WHERE (t.i - 1) // 8 = co.j AND ce.i = t.i GROUP BY 1, 2) " +
      "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adist FROM (" +
      "SELECT query_id, neighbor_id, round(raw, 6) AS adist, " +
      "row_number() OVER (PARTITION BY query_id " +
      "ORDER BY round(raw, 6), neighbor_id) AS rank FROM qd) WHERE rank <= 5"

  /**
   * Generated oracle for TRUE iterative BPE: round r counts adjacent
   * unit pairs over the corpus as left by rounds 1..r-1 (the
   * double-space encoding of text_bpe_apply: each unit wrapped in its
   * own spaces, merges replace '␠x␠␠y␠' with '␠x<chr1>y␠' left-to-
   * right non-overlapping), takes the top pair (count desc, pair
   * asc), applies it, and recurses — n chained CTE pairs, since the
   * per-round aggregate can't live inside one recursive CTE. Output:
   * the merge table with selection counts.
   */
  /** The s0..sN segment-and-count CTE chain shared by the BPE oracles. */
  private def bpeChainSql(n: Int): String = {
    val sb = new StringBuilder
    // MATERIALIZED is load-bearing: every s_r is referenced twice
    // (by m_{r+1} and s_{r+1}); DuckDB inlines plain CTEs, so an
    // n-round chain would expand to 2^n scans of `documents` ("too
    // many open files" at n=16, exponential CPU before that)
    sb ++= "WITH s0 AS MATERIALIZED (SELECT doc_id, ' ' || array_to_string(" +
      "string_split(lower(text), ' '), '  ') || ' ' AS s FROM documents)"
    for (r <- 1 to n) {
      sb ++= s", m$r AS MATERIALIZED (SELECT array_to_string(u[i:i+1], ' ') AS pair, " +
        "count(*) AS cnt FROM (SELECT string_split(trim(s), '  ') AS u " +
        s"FROM s${r - 1}), UNNEST(generate_series(1, greatest(len(u) - 1, 0))) t(i) " +
        "GROUP BY pair HAVING count(*) >= 2 ORDER BY cnt DESC, pair LIMIT 1)"
      sb ++= s", s$r AS MATERIALIZED (SELECT doc_id, replace(s, " +
        "' ' || split_part(pair, ' ', 1) || '  ' || split_part(pair, ' ', 2) || ' ', " +
        "' ' || split_part(pair, ' ', 1) || chr(1) || split_part(pair, ' ', 2) || ' ') AS s " +
        s"FROM s${r - 1}, m$r)"
    }
    sb.toString
  }

  private def bpeIterativeSql(n: Int): String = {
    val sb = new StringBuilder
    sb ++= bpeChainSql(n)
    sb ++= " SELECT * FROM (" + (1 to n).map { r =>
      s"SELECT CAST($r AS BIGINT) AS rank, " +
        "replace(split_part(pair, ' ', 1), chr(1), ' ') AS x, " +
        "replace(split_part(pair, ' ', 2), chr(1), ' ') AS y, cnt " +
        s"FROM m$r"
    }.mkString(" UNION ALL ") + ")"
    sb.toString
  }

  /** Exhaustive batch×corpus jaccard pairs at the 10%-cut — oracle for both the broadcast and the persistent-index incremental paths. */
  private def incrementalDedupSqlWith(corpusFilter: String): String =
    "WITH cut AS (SELECT (max(doc_id) + 1) * 9 // 10 AS c FROM documents), " +
      "tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
      "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
      "pr AS (SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, count(*) AS inter " +
      "FROM sh a JOIN sh b ON a.shingle = b.shingle, cut " +
      s"WHERE a.doc_id >= cut.c AND b.doc_id < cut.c ${corpusFilter}GROUP BY 1, 2) " +
      "SELECT new_id, corpus_id, " +
      "round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard " +
      "FROM pr JOIN sizes sa ON new_id = sa.doc_id " +
      "JOIN sizes sb ON corpus_id = sb.doc_id " +
      "WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7"

  private val incrementalDedupSql: String = incrementalDedupSqlWith("")

  /** Paragraph-rewrite replay; `where` restricts the emitted docs (not the dedup scope). */
  private def paragraphSql(where: String): String =
    "WITH sp AS (SELECT doc_id, CAST(doc_id AS BIGINT) AS ord, " +
      "string_split(text, ' ') AS ws FROM documents), " +
      "w AS (SELECT doc_id, ord, unnest(ws) AS word, " +
      "generate_subscripts(ws, 1) AS i FROM sp), " +
      "p AS (SELECT doc_id, ord, CAST(floor((i - 1) / 15) AS BIGINT) AS pidx, " +
      "string_agg(word, ' ' ORDER BY i) AS ptext FROM w GROUP BY doc_id, ord, floor((i - 1) / 15)), " +
      "k AS (SELECT doc_id, pidx, ptext, " +
      "row_number() OVER (PARTITION BY ptext ORDER BY ord, pidx) AS rn FROM p), " +
      "r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, " +
      "string_agg(ptext, ' ' ORDER BY pidx) AS text_kept FROM k WHERE rn = 1 GROUP BY doc_id), " +
      "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras FROM p GROUP BY doc_id) " +
      "SELECT t.doc_id, t.n_paras, CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept, " +
      "coalesce(r.text_kept, '') AS text_kept FROM tot t LEFT JOIN r ON t.doc_id = r.doc_id" +
      where

  /** Recursive-CTE closure over the near-dup pair graph — oracle for both the iterative CC operator and the SQL-surface recursion. */
  /** Span-rewrite replay; `finalWhere` restricts the OUTPUT docs only. */
  private def spanRewriteSql(finalWhere: String): String =
    "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "pos AS (SELECT doc_id, i - 1 AS p, array_to_string(w[i:i+19], ' ') AS sh " +
      "FROM tok, UNNEST(generate_series(1, len(w) - 19)) t(i) WHERE len(w) >= 20), " +
      "dup AS (SELECT doc_id, p FROM (SELECT doc_id, p, " +
      "row_number() OVER (PARTITION BY sh ORDER BY doc_id, p) AS rn FROM pos) " +
      "WHERE rn > 1), " +
      "cov AS (SELECT DISTINCT doc_id, tp FROM dup, " +
      "UNNEST(generate_series(p, p + 19)) c(tp)), " +
      "tkn AS (SELECT doc_id, i - 1 AS tp, w[i] AS tokn FROM tok, " +
      "UNNEST(generate_series(1, len(w))) t(i)), " +
      "kept AS (SELECT tkn.doc_id, tkn.tp, tkn.tokn FROM tkn " +
      "LEFT JOIN cov ON tkn.doc_id = cov.doc_id AND tkn.tp = cov.tp " +
      "WHERE cov.tp IS NULL), " +
      "agg AS (SELECT doc_id, count(*) AS n_after, " +
      "string_agg(tokn, ' ' ORDER BY tp) AS txt FROM kept GROUP BY doc_id) " +
      "SELECT tok.doc_id, CAST(len(tok.w) AS BIGINT) AS n_before, " +
      "CAST(coalesce(agg.n_after, 0) AS BIGINT) AS n_after, " +
      "md5(coalesce(agg.txt, '')) AS rewritten_md5 " +
      "FROM tok LEFT JOIN agg USING (doc_id)" + finalWhere

  private lazy val clustersSql: String =
    "WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
      "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
      "pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter " +
      "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "pairs AS (SELECT a_id, b_id FROM pr JOIN sizes sa ON a_id = sa.doc_id " +
      "JOIN sizes sb ON b_id = sb.doc_id " +
      "WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7), " +
      "edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION SELECT b_id, a_id FROM pairs), " +
      "reach(u, v) AS (SELECT u, v FROM edges UNION " +
      "SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u) " +
      "SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u"

  private val stopwordsSql = "('the','a','an','of','and','or','in','on','to','is')"

  /**
   * DuckDB replay of [[partsuppDerived]] — same ring-walk assignment
   * and modular attributes, floor-division spelled explicitly (DuckDB
   * CAST rounds half-away where Spark's floor truncates).
   */
  private val partsuppOracleCte =
    "partsupp AS (SELECT ps_partkey, ps_suppkey, " +
      "((ps_partkey * 37 + ps_suppkey * 43) % 9999) + 1 AS ps_availqty, " +
      "CAST(((ps_partkey * 53 + ps_suppkey * 61) % 920) + 1 AS DOUBLE) AS ps_supplycost " +
      "FROM (SELECT DISTINCT p_partkey AS ps_partkey, " +
      "((p_partkey + i.i * (CAST(floor(sc.s / 4.0) AS BIGINT) " +
      "+ CAST(floor((p_partkey - 1.0) / sc.s) AS BIGINT))) % sc.s) + 1 AS ps_suppkey " +
      "FROM part, (VALUES (0), (1), (2), (3)) i(i), " +
      "(SELECT count(*) AS s FROM supplier) sc))"

  /**
   * Shared co-purchase edge CTE for the graph oracles; replays
   * Graph.coOccurrenceEdges' maxGroup cap (groups of 2..1000 distinct
   * parts) so an order with a pathological line count would drop from
   * BOTH engine and oracle instead of silently diverging.
   */
  private val graphEdgeCte: String =
    "WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 10 = 0), " +
      "g AS (SELECT l_orderkey FROM li GROUP BY l_orderkey " +
      "HAVING count(DISTINCT l_partkey) BETWEEN 2 AND 1000), " +
      "e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst " +
      "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey " +
      "JOIN g ON a.l_orderkey = g.l_orderkey), "

  private lazy val qualitySql: String =
    "WITH m AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens, " +
      "round((length(text) - (len(string_split(lower(text), ' ')) - 1)) * 1.0 / " +
      "len(string_split(lower(text), ' ')), 4) AS avg_token_len, " +
      "round(len(list_filter(string_split(lower(text), ' '), x -> x IN " + stopwordsSql + ")) " +
      "* 1.0 / len(string_split(lower(text), ' ')), 4) AS stopword_ratio, " +
      "round(len(list_distinct(string_split(lower(text), ' '))) * 1.0 / " +
      "len(string_split(lower(text), ' ')), 4) AS distinct_ratio FROM documents) " +
      "SELECT doc_id, n_tokens, avg_token_len, stopword_ratio, distinct_ratio, " +
      "round(least(n_tokens / 64.0, 1.0) * 0.4 + least(stopword_ratio * 5.0, 1.0) * 0.2 " +
      "+ distinct_ratio * 0.4, 6) AS quality FROM m"

  /** Gopher census oracle: the qualitySql signal arithmetic + the rule gates. */
  private lazy val gopherCensusSql: String =
    "WITH m AS (SELECT source, " +
      "len(string_split(lower(text), ' ')) AS n, " +
      "round((length(text) - (len(string_split(lower(text), ' ')) - 1)) * 1.0 / " +
      "len(string_split(lower(text), ' ')), 4) AS awl, " +
      "round(len(list_filter(string_split(lower(text), ' '), x -> x IN " + stopwordsSql + ")) " +
      "* 1.0 / len(string_split(lower(text), ' ')), 4) AS sr, " +
      "round(1.0 - len(list_distinct(string_split(lower(text), ' '))) * 1.0 / " +
      "len(string_split(lower(text), ' ')), 4) AS dup FROM documents), " +
      "f AS (SELECT source, (n < 25 OR n > 100000) AS f_len, " +
      "(awl < 3.0 OR awl > 5.0) AS f_awl, sr < 0.02 AS f_stop, " +
      "dup > 0.6 AS f_dup FROM m) " +
      "SELECT source, count(*) AS n_docs, " +
      "count(*) FILTER (f_len) AS n_fail_len, " +
      "count(*) FILTER (f_awl) AS n_fail_wordlen, " +
      "count(*) FILTER (f_stop) AS n_fail_stopword, " +
      "count(*) FILTER (f_dup) AS n_fail_dup, " +
      "count(*) FILTER (NOT f_len AND NOT f_awl AND NOT f_stop AND NOT f_dup) AS n_kept " +
      "FROM f GROUP BY source"

  /** Hashed-linear-classifier replay (md5 bucket → stub weight → sigmoid of the mean). */
  private lazy val classifySql: String =
    "WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents), " +
      "s AS (SELECT doc_id, len(w) AS n, list_reduce(list_prepend(0.0, list_transform(w, " +
      "x -> ((((('0x'||substr(md5(x),13,4))::UBIGINT % 1024)::BIGINT * 2654435761 + 7) " +
      "% 2000001) / 1000000.0 - 1.0))), (a, b) -> a + b) AS wsum FROM tok) " +
      "SELECT doc_id, round(1.0 / (1.0 + exp(-(wsum / n))), 4) AS clf_score, " +
      "wsum >= 0 AS clf_label FROM s"

  private lazy val langidSql: String =
    "WITH s AS (SELECT doc_id, " +
      "len(list_filter(string_split(lower(text), ' '), x -> x IN ('the','and','of','is','to','a'))) AS s_en, " +
      "len(list_filter(string_split(lower(text), ' '), x -> x IN ('le','la','et','les','des','un'))) AS s_fr, " +
      "len(list_filter(string_split(lower(text), ' '), x -> x IN ('el','la','de','los','que','un'))) AS s_es, " +
      "len(list_filter(string_split(lower(text), ' '), x -> x IN ('der','die','und','das','ein','ist'))) AS s_de, " +
      "len(list_filter(string_split(lower(text), ' '), x -> x IN ('de','shi','le','bu','wo','zai'))) AS s_zh " +
      "FROM documents), m AS (SELECT *, greatest(s_en, s_fr, s_es, s_de, s_zh) AS mx FROM s) " +
      "SELECT doc_id, CASE WHEN s_en = mx AND mx > 0 THEN 'en' " +
      "WHEN s_fr = mx AND mx > 0 THEN 'fr' WHEN s_es = mx AND mx > 0 THEN 'es' " +
      "WHEN s_de = mx AND mx > 0 THEN 'de' WHEN s_zh = mx AND mx > 0 THEN 'zh' " +
      "ELSE 'und' END AS pred_lang FROM m"

  /** Recursive-closure derived table: doc_ids dropped as non-representative near-dups. */
  private lazy val droppedSql: String =
    "(WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
      "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
      "pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter " +
      "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "pairs AS (SELECT a_id, b_id FROM pr JOIN sizes sa ON a_id = sa.doc_id " +
      "JOIN sizes sb ON b_id = sb.doc_id " +
      "WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7), " +
      "edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION SELECT b_id, a_id FROM pairs), " +
      "reach(u, v) AS (SELECT u, v FROM edges UNION " +
      "SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u) " +
      "SELECT u AS doc_id FROM reach GROUP BY u HAVING least(u, min(v)) < u)"

  def oracleSql: Map[String, String] = Map(
    "lmr_count" -> "SELECT count(*) AS cnt FROM lineitem",
    "lmr_filter_map" ->
      "SELECT concat('order:', o_orderkey) AS key FROM orders WHERE o_orderstatus = 'O'",
    "lmr_reshuffle_etl" ->
      ("SELECT concat('order:', o_orderkey) AS key, concat(upper(o_orderpriority), '!') AS value " +
        "FROM orders WHERE o_orderstatus = 'O'"),
    "lmr_dbsize" -> "SELECT count(*) AS dbsize FROM customer",
    "lmr_error_channel" ->
      "SELECT CAST(0 AS BIGINT) AS n_results, count(*) AS n_errors FROM orders",
    // replays the shard×command reply matrix: 8 shards × 3 commands,
    // command 2 scaled by the region count read from the same tables
    "q_internal_command" ->
      ("SELECT s.shard, c.cmd, CASE c.cmd " +
        "WHEN 0 THEN 'shard-'||s.shard||':pong' " +
        "WHEN 1 THEN CAST((s.shard*31+7)%16384 AS VARCHAR) " +
        "ELSE CAST((s.shard+1)*n.nr AS VARCHAR) END AS reply " +
        "FROM generate_series(0,7) s(shard), generate_series(0,2) c(cmd), " +
        "(SELECT count(*) AS nr FROM region) n"),
    // the function census IS the engine's spec surface — the oracle
    // replays it from the same registration list the session wires
    "q_info" -> {
      val fnRows = GraftExtensions.functions.map(_._1).sorted
        .map(n => s"('function', '$n', 'registered')").mkString(", ")
      "SELECT section, key, value FROM (VALUES " +
        "('engine', 'slots', '16384'), " + fnRows + ", " +
        "('strategy', 'topk_per_key', 'injected')) t(section, key, value)"
    },
    "q1_pricing" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_base_price, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
        "round(avg(l_quantity), 4) AS avg_qty, round(avg(l_discount), 4) AS avg_disc, " +
        "count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    "q3_topk_revenue" ->
      ("SELECT l_orderkey, o_orderpriority, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING' " +
        "GROUP BY l_orderkey, o_orderpriority ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "q5_nation_revenue" ->
      ("SELECT r_name, n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "count(*) AS n_items FROM lineitem " +
        "JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name"),
    "q7_volume_shipping" ->
      ("SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue FROM (" +
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
        "CAST(year(l_shipdate) AS BIGINT) AS l_year, " +
        "l_extendedprice * (1 - l_discount) AS volume " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey " +
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
        "WHERE n1.n_name IN ('NATION_3', 'NATION_7') " +
        "AND n2.n_name IN ('NATION_3', 'NATION_7') AND n1.n_name != n2.n_name " +
        "AND l_shipdate BETWEEN '1996-01-01' AND '1997-12-31') " +
        "GROUP BY 1, 2, 3"),
    "q8_market_share" ->
      ("WITH vol AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        "l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS supp_nation " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY' " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
        "JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE' " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
        "WHERE o_orderdate BETWEEN '1996-01-01' AND '1997-12-31') " +
        "SELECT o_year, " +
        "round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 2) AS nation_volume, " +
        "round(sum(volume), 2) AS total_volume, " +
        "round(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 2) " +
        "/ round(sum(volume), 2), 4) AS mkt_share " +
        "FROM vol GROUP BY 1"),
    // top-20 on the ROUNDED revenue with custkey tiebreak (both engines
    // order by identical values)
    "q10_returned_items" ->
      ("SELECT c_custkey, c_name, n_name, revenue FROM (" +
        "SELECT c_custkey, c_name, n_name, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE l_returnflag = 'R' " +
        "AND o_orderdate BETWEEN '1996-01-01' AND '1996-06-30' " +
        "GROUP BY 1, 2, 3) ORDER BY revenue DESC, c_custkey LIMIT 20"),
    "q12_late_shipments" ->
      ("SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high' " +
        "ELSE 'low' END AS priority_class, " +
        "date_diff('day', o_orderdate, l_shipdate) > 90 AS late, " +
        "count(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2"),
    "q14_promo_share" ->
      ("SELECT mon, promo_revenue, total_revenue, " +
        "round(promo_revenue / total_revenue, 4) AS promo_share FROM (" +
        "SELECT date_trunc('month', l_shipdate) AS mon, " +
        "round(sum(CASE WHEN p_type = 'PROMO' " +
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS promo_revenue, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-12-31' GROUP BY 1)"),
    "q4_priority_check" ->
      ("SELECT o_orderpriority, count(*) AS n_orders FROM orders " +
        "WHERE o_orderdate BETWEEN '1996-01-01' AND '1996-03-31' " +
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
        "AND date_diff('day', o_orderdate, l_shipdate) > 60) GROUP BY 1"),
    "q6_forecast_revenue" ->
      ("SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, " +
        "count(*) AS n_items FROM lineitem " +
        "WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-12-31' " +
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),
    "q13_order_distribution" ->
      ("SELECT c_count, count(*) AS custdist FROM (" +
        "SELECT c_custkey, count(o_orderkey) AS c_count " +
        "FROM customer LEFT OUTER JOIN orders " +
        "ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW' " +
        "GROUP BY c_custkey) GROUP BY c_count"),
    "q15_top_supplier" ->
      ("WITH rev AS (SELECT l_suppkey, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue " +
        "FROM lineitem WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-03-31' " +
        "GROUP BY 1) " +
        "SELECT s_suppkey, s_name, total_revenue FROM supplier " +
        "JOIN rev ON s_suppkey = l_suppkey " +
        "WHERE total_revenue = (SELECT max(total_revenue) FROM rev)"),
    "q17_small_qty_revenue" ->
      ("WITH bl AS (SELECT l_partkey, l_quantity, l_extendedprice " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE p_brand = 'Brand#3'), " +
        "lim AS (SELECT l_partkey AS lp, avg(l_quantity) * 0.2 AS qty_limit " +
        "FROM bl GROUP BY 1) " +
        "SELECT count(*) AS n_items, " +
        "round(round(sum(l_extendedprice), 2) / 7.0, 2) AS avg_yearly " +
        "FROM bl JOIN lim ON l_partkey = lp WHERE l_quantity < qty_limit"),
    "q18_large_orders" ->
      ("SELECT c_name, c_custkey, o_orderkey, o_orderdate, " +
        "round(o_totalprice, 2) AS total_price, total_qty FROM (" +
        "SELECT l_orderkey, sum(l_quantity) AS total_qty FROM lineitem " +
        "GROUP BY 1 HAVING sum(l_quantity) > 300) " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "ORDER BY total_qty DESC, o_orderkey LIMIT 100"),
    "q19_brand_promo" ->
      ("SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "count(*) AS n_items FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 " +
        "AND l_quantity BETWEEN 1 AND 11) " +
        "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 " +
        "AND l_quantity BETWEEN 10 AND 20) " +
        "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 " +
        "AND l_quantity BETWEEN 20 AND 30)"),
    "q21_waiting_supplier" ->
      ("SELECT s_name, count(*) AS numwait FROM supplier " +
        "JOIN lineitem l1 ON s_suppkey = l1.l_suppkey " +
        "JOIN orders ON o_orderkey = l1.l_orderkey " +
        "WHERE o_orderstatus = 'F' " +
        "AND date_diff('day', o_orderdate, l1.l_shipdate) > 90 " +
        "AND EXISTS (SELECT 1 FROM lineitem l2 " +
        "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
        "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey " +
        "AND date_diff('day', o_orderdate, l3.l_shipdate) > 90) " +
        "GROUP BY s_name"),
    "q22_idle_customers" ->
      ("SELECT c_nationkey, count(*) AS n_customers, " +
        "round(sum(c_acctbal), 2) AS total_bal FROM customer " +
        "WHERE c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer " +
        "WHERE c_acctbal > 0) " +
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderdate >= '2000-01-01') GROUP BY 1"),
    // the derived-partsupp CTE every partsupp oracle replays: dbgen's
    // supplier-assignment ring walk + the same modular attributes the
    // Spark side computes (partsuppDerived) — an independent DuckDB
    // rebuild of the identical rows
    "q2_min_cost_supplier" ->
      (s"WITH $partsuppOracleCte, " +
        "eur AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'), " +
        "offers AS (SELECT * FROM partsupp " +
        "JOIN (SELECT p_partkey, p_brand FROM part " +
        "WHERE p_type = 'LARGE') p ON ps_partkey = p_partkey " +
        "JOIN eur ON ps_suppkey = s_suppkey) " +
        "SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, " +
        "ps_supplycost AS min_cost FROM offers o " +
        "WHERE ps_supplycost = (SELECT min(ps_supplycost) FROM offers " +
        "WHERE ps_partkey = o.ps_partkey) " +
        "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"),
    "q9_product_profit" ->
      (s"WITH $partsuppOracleCte " +
        "SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        "round(sum(l_extendedprice * (1 - l_discount) " +
        "- ps_supplycost * l_quantity), 2) AS sum_profit " +
        "FROM lineitem " +
        "JOIN (SELECT p_partkey FROM part WHERE p_name LIKE '%rod%') p " +
        "ON l_partkey = p_partkey " +
        "JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1, 2"),
    "q11_important_stock" ->
      (s"WITH $partsuppOracleCte, " +
        "scoped AS (SELECT ps_partkey, ps_supplycost * ps_availqty AS value " +
        "FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3') " +
        "SELECT ps_partkey, round(sum(value), 2) AS stock_value FROM scoped " +
        "GROUP BY 1 HAVING sum(value) > (SELECT sum(value) * 0.001 FROM scoped)"),
    "q16_parts_supplier_cnt" ->
      (s"WITH $partsuppOracleCte " +
        "SELECT p_brand, p_type, p_size, " +
        "count(DISTINCT ps_suppkey) AS supplier_cnt FROM partsupp " +
        "JOIN part ON ps_partkey = p_partkey " +
        "WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' " +
        "AND p_size IN (1, 5, 9, 15) " +
        "AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
        "GROUP BY 1, 2, 3"),
    "q20_stocked_promo_suppliers" ->
      (s"WITH $partsuppOracleCte, " +
        "shipped AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty " +
        "FROM lineitem JOIN (SELECT p_partkey FROM part " +
        "WHERE p_name LIKE 'blue%') p ON l_partkey = p_partkey " +
        "WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-12-31' " +
        "GROUP BY 1, 2) " +
        "SELECT s_name, n_name FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'EUROPE' AND s_suppkey IN (" +
        "SELECT ps_suppkey FROM partsupp " +
        "JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey " +
        "WHERE ps_availqty > qty * 0.5)"),
    "q_window_latest_orders" ->
      ("SELECT o_custkey, o_orderkey, rn, total FROM (" +
        "SELECT o_custkey, o_orderkey, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn, " +
        "round(o_totalprice, 2) AS total FROM orders) WHERE rn <= 3"),
    "q_rollup" ->
      ("SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY ROLLUP(r_name, n_name)"),
    "q_intersect" ->
      ("SELECT DISTINCT c_nationkey AS nationkey FROM customer " +
        "INTERSECT SELECT DISTINCT s_nationkey AS nationkey FROM supplier"),
    "q_except" ->
      ("SELECT DISTINCT c_nationkey AS nationkey FROM customer " +
        "EXCEPT SELECT DISTINCT s_nationkey AS nationkey FROM supplier"),
    "q_anti_join" ->
      ("SELECT c_mktsegment, count(*) AS n_customers_no_orders FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "GROUP BY c_mktsegment"),
    "q_semi_join" ->
      ("SELECT o_orderpriority, count(*) AS n_orders FROM orders " +
        "WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49) " +
        "GROUP BY o_orderpriority"),
    "q_scalar_funcs" ->
      ("SELECT p_partkey, upper(p_brand) AS brand_u, length(p_name) AS name_len, " +
        "round(p_retailprice * 1.1, 2) AS inflated, substring(p_type, 1, 5) AS type5, " +
        "concat_ws('#', p_brand, p_type) AS tag, " +
        "CAST(abs(p_size - 25) AS BIGINT) AS size_dev FROM part"),
    "q_date_funcs" ->
      ("SELECT year(l_shipdate) AS y, month(l_shipdate) AS m, count(*) AS n, " +
        "round(sum(l_extendedprice), 2) AS sum_price FROM lineitem GROUP BY y, m"),
    "q_distinct_agg" ->
      ("SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_items, " +
        "round(avg(l_discount), 4) AS avg_disc FROM lineitem GROUP BY l_suppkey"),
    "q_keys_source" ->
      ("SELECT concat('user:', i) AS key, concat('v(', reverse(concat('user:', i)), ')') " +
        "AS payload FROM (SELECT unnest(generate_series(0, 1999)) AS i) WHERE i % 4 = 0"),
    "q_topk_custom" ->
      ("SELECT o_orderstatus, o_orderkey, total FROM (" +
        "SELECT o_orderstatus, o_orderkey, round(o_totalprice, 2) AS total, " +
        "row_number() OVER (PARTITION BY o_orderstatus " +
        "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) WHERE rn <= 3"),
    "q_grouping_sets" ->
      ("SELECT r_name, n_name, count(*) AS n, round(sum(c_acctbal), 2) AS bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())"),
    "q_subqueries" ->
      ("SELECT c_mktsegment, count(*) AS n_rich_active FROM customer " +
        "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) " +
        "AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "GROUP BY c_mktsegment"),
    "q_udaf_weighted" ->
      ("SELECT l_returnflag, round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) " +
        "AS wavg_price, count(*) AS n FROM lineitem GROUP BY l_returnflag"),
    "q_array_agg" ->
      ("SELECT o_orderstatus, array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') " +
        "AS priorities, count(DISTINCT o_orderpriority) AS n_priorities " +
        "FROM orders GROUP BY o_orderstatus"),
    "q_cumulative" ->
      ("WITH m AS (SELECT l_returnflag, year(l_shipdate) AS y, month(l_shipdate) AS m, " +
        "sum(l_extendedprice) AS rev FROM lineitem GROUP BY 1, 2, 3) " +
        "SELECT l_returnflag, y, m, round(rev, 2) AS rev, " +
        "round(sum(rev) OVER (PARTITION BY l_returnflag ORDER BY y, m " +
        "ROWS UNBOUNDED PRECEDING), 2) AS cum_rev FROM m"),
    "q_range_band" ->
      ("SELECT band, count(*) AS n, round(avg(value), 4) AS avg_value FROM events " +
        "JOIN (SELECT i AS band, i * 20.0 AS lo, (i + 1) * 20.0 AS hi FROM " +
        "(SELECT unnest(generate_series(0, 9)) AS i)) b " +
        "ON value >= lo AND value < hi GROUP BY band"),
    "q_union_paging" ->
      ("SELECT name, kind FROM (" +
        "SELECT c_name AS name, 'customer' AS kind FROM customer " +
        "UNION ALL SELECT s_name AS name, 'supplier' AS kind FROM supplier) " +
        "ORDER BY name, kind LIMIT 20 OFFSET 20"),
    "q_json_extract" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k " +
        "FROM events GROUP BY event_type"),
    "q_outer_join" ->
      ("SELECT coalesce(c_mktsegment, 'NO_CUSTOMER') AS segment, " +
        "count(o_orderkey) AS n_orders, count(DISTINCT c_custkey) AS n_customers " +
        "FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey GROUP BY segment"),
    "q_cube" ->
      ("SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
        "round(sum(o_totalprice), 2) AS sum_price FROM orders " +
        "GROUP BY CUBE(o_orderstatus, o_orderpriority)"),
    "q_string_match" ->
      ("SELECT p_brand, count(*) AS n FROM part " +
        "WHERE p_name LIKE '%a%' AND regexp_matches(p_type, '[MN]') GROUP BY p_brand"),
    "q_date_arith" ->
      ("SELECT o_orderstatus, round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_delay, " +
        "CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_delay, " +
        "count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderstatus"),
    "q_asof_join" ->
      ("SELECT e.event_id, o.o_orderkey FROM events e ASOF LEFT JOIN " +
        "(SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey " +
        "FROM orders GROUP BY o_custkey, o_orderdate) o " +
        "ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"),
    "q_percentile" ->
      ("SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 2) AS median, " +
        "round(quantile_cont(o_totalprice, 0.9), 2) AS p90 FROM orders GROUP BY o_orderstatus"),
    "q_pivot" ->
      ("SELECT user_id, count(CASE WHEN event_type = 'click' THEN 1 END) AS click, " +
        "count(CASE WHEN event_type = 'view' THEN 1 END) AS view, " +
        "count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase, " +
        "count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup, " +
        "count(CASE WHEN event_type = 'error' THEN 1 END) AS error " +
        "FROM events GROUP BY user_id"),
    "q_sample_hash" ->
      ("SELECT c_custkey, c_mktsegment FROM customer " +
        "WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1) = '0'"),
    "q_rank_variants" ->
      ("SELECT p_brand, p_partkey, rn, rk, drk, prev_price FROM (" +
        "SELECT p_brand, p_partkey, " +
        "row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk, " +
        "round(lag(p_retailprice, 1) OVER w, 2) AS prev_price FROM part " +
        "WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)) " +
        "WHERE rn <= 3"),
    "q_corr_stats" ->
      ("SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr, " +
        "round(stddev_samp(l_discount), 4) AS disc_stddev, " +
        "round(var_samp(l_tax), 4) AS tax_var, count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag"),
    "q_conditional_agg" ->
      ("SELECT l_linestatus, " +
        "CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted, " +
        "round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END), 2) AS returned_value, " +
        "round(avg(CASE WHEN l_quantity > 25 THEN l_quantity END), 4) AS avg_large_qty " +
        "FROM lineitem GROUP BY l_linestatus"),
    "q_events_window" ->
      ("SELECT date_trunc('hour', ts) AS win_start, event_type, count(*) AS n, " +
        "round(sum(value), 2) AS sum_value FROM events GROUP BY win_start, event_type"),
    "q_sessionize" ->
      ("WITH d AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS new_session " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)) " +
        "SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, " +
        "count(*) AS n_events FROM d GROUP BY user_id"),
    // SCD2: change rows by lag, intervals closed by lead — ms-floored
    // timestamps on both engines (ns→ms floors agree)
    "q_scd2" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events), " +
        "d AS (SELECT user_id, event_id, event_type, ms, lag(event_type) OVER w AS prev_type " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)), " +
        "c AS (SELECT * FROM d WHERE prev_type IS NULL OR prev_type <> event_type) " +
        "SELECT user_id, CAST(row_number() OVER w2 AS BIGINT) AS version, " +
        "event_type AS state, ms AS valid_from_ms, lead(ms) OVER w2 AS valid_to_ms, " +
        "lead(ms) OVER w2 IS NULL AS is_current " +
        "FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ms, event_id)"),
    // point-in-time lookup replayed as the explicit interval join
    // (>= valid_from, < valid_to, open current interval)
    "q_dim_lookup" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms, value FROM events), " +
        "d0 AS (SELECT user_id, event_id, event_type, ms, lag(event_type) OVER w AS prev_type " +
        "FROM (SELECT * FROM e WHERE event_type <> 'purchase') " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)), " +
        "c AS (SELECT * FROM d0 WHERE prev_type IS NULL OR prev_type <> event_type), " +
        "dim AS (SELECT user_id, event_type AS state, ms AS valid_from_ms, " +
        "lead(ms) OVER w2 AS valid_to_ms " +
        "FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ms, event_id)), " +
        "p AS (SELECT user_id, ms, value FROM e WHERE event_type = 'purchase') " +
        "SELECT coalesce(dim.state, 'none') AS state, count(*) AS n_purchases, " +
        "round(sum(p.value), 2) AS sum_value " +
        "FROM p LEFT JOIN dim ON p.user_id = dim.user_id " +
        "AND p.ms >= dim.valid_from_ms " +
        "AND (dim.valid_to_ms IS NULL OR p.ms < dim.valid_to_ms) " +
        "GROUP BY 1"),
    // last-touch attribution replayed with DuckDB's native ASOF LEFT JOIN
    // (inclusive t.ts <= p.ts matches asofBackward's equal-ts ordering)
    "q_attribution" ->
      ("WITH p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'), " +
        "tch AS (SELECT user_id, ts, event_type AS touch_type FROM events " +
        "WHERE event_type IN ('view', 'click', 'signup')) " +
        "SELECT coalesce(t.touch_type, 'none') AS touch_type, count(*) AS n_purchases, " +
        "round(sum(p.value), 2) AS attributed_value " +
        "FROM p ASOF LEFT JOIN tch t ON p.user_id = t.user_id AND t.ts <= p.ts " +
        "GROUP BY 1"),
    // cohort retention: first-seen day x day-offset active-user matrix;
    // activity is pre-distinct per (user, day) so counts are plain count(*)
    "q_event_cohorts" ->
      ("WITH fs AS (SELECT user_id, date_trunc('day', min(ts)) AS cohort_day " +
        "FROM events GROUP BY 1), " +
        "act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events), " +
        "sz AS (SELECT cohort_day, count(*) AS cohort_users FROM fs GROUP BY 1), " +
        "m AS (SELECT f.cohort_day, date_diff('day', f.cohort_day, a.day) AS day_offset, " +
        "count(*) AS active_users FROM act a JOIN fs f USING (user_id) GROUP BY 1, 2) " +
        "SELECT m.cohort_day, m.day_offset, m.active_users, " +
        "round(m.active_users / sz.cohort_users, 4) AS retention " +
        "FROM m JOIN sz USING (cohort_day)"),
    "stream_sessions" ->
      ("WITH d AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS new_session " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "s AS (SELECT user_id, ts, sum(new_session) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id FROM d) " +
        "SELECT user_id, date_trunc('second', min(ts)) AS session_start, count(*) AS n_events " +
        "FROM s GROUP BY user_id, session_id"),
    // windowed volume anomalies: |z| >= 2 on the 4-decimal rounding
    "stream_zscore" ->
      ("WITH wc AS (SELECT date_trunc('hour', ts) AS win_start, event_type, " +
        "count(*) AS n FROM events GROUP BY 1, 2), " +
        "st AS (SELECT event_type, avg(n) AS mean_n, stddev_samp(n) AS sd_n, " +
        "count(*) AS n_windows FROM wc GROUP BY 1), " +
        "z AS (SELECT wc.win_start, wc.event_type, wc.n, " +
        "round((wc.n - st.mean_n) / st.sd_n, 4) AS z FROM wc JOIN st USING(event_type) " +
        "WHERE st.n_windows >= 2 AND st.sd_n > 0) " +
        "SELECT win_start, event_type, n, z FROM z WHERE abs(z) >= 2.0"),
    // per-hour top-3 users by activity (streaming leaderboard twin)
    "stream_topk" ->
      ("WITH c AS (SELECT date_trunc('hour', ts) AS win_start, user_id, count(*) AS n " +
        "FROM events GROUP BY 1, 2), " +
        "r AS (SELECT win_start, user_id, n, row_number() OVER " +
        "(PARTITION BY win_start ORDER BY n DESC, user_id) AS rn FROM c) " +
        "SELECT win_start, user_id, n FROM r WHERE rn <= 3"),
    "stream_click_purchase" ->
      ("SELECT c.user_id, count(*) AS n_conversions, " +
        "round(avg((epoch_ms(p.ts) - epoch_ms(c.ts)) / 1000.0), 4) AS avg_delay_s " +
        "FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c " +
        "JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p " +
        "ON c.user_id = p.user_id " +
        "AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 1 AND 1800000000 " +
        "GROUP BY c.user_id"),
    "stream_unconverted" ->
      ("SELECT user_id, count(*) AS n_rows, " +
        "count(*) FILTER (p_ts IS NULL) AS n_unconverted FROM (" +
        "SELECT c.user_id, p.ts AS p_ts " +
        "FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c " +
        "LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p " +
        "ON c.user_id = p.user_id " +
        "AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 1 AND 1800000000" +
        ") GROUP BY user_id"),
    "stream_user_stats" ->
      ("SELECT user_id, count(*) AS n_events, " +
        "floor(sum(value) * 100 + 0.5) / 100 AS total_value, " +
        "max(value) AS max_value FROM events GROUP BY user_id"),
    "dedup_exact" ->
      ("SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_id " +
        "FROM documents GROUP BY md5(text) HAVING count(*) > 1"),
    "dedup_ngram_jaccard" -> ngramJaccardSql,
    // bloom-gate summary: exact counts replay; the structural
    // guarantees are assertion columns (the q_approx_distinct pattern)
    "dedup_bloom_gate" ->
      ("WITH cut AS (SELECT (max(doc_id) + 1) * 9 // 10 AS c FROM documents), " +
        "b AS (SELECT text FROM documents, cut WHERE doc_id >= c), " +
        "ct AS (SELECT DISTINCT text FROM documents, cut WHERE doc_id < c) " +
        "SELECT count(*) AS n_batch, " +
        "count(*) FILTER (b.text IN (SELECT text FROM ct)) AS n_true_dups, " +
        "TRUE AS no_false_negatives, TRUE AS gate_effective FROM b"),
    "dedup_containment" ->
      ("WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
        "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
        "pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter " +
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT a_id, b_id, round(inter * 1.0 / sa.n, 4) AS c_ab, " +
        "round(inter * 1.0 / sb.n, 4) AS c_ba " +
        "FROM pairs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id " +
        "WHERE greatest(inter * 1.0 / sa.n, inter * 1.0 / sb.n) >= 0.8"),
    // MinHash LSH + exact-jaccard verification ≡ the exhaustive pairs (see dedupMinhash note)
    "dedup_minhash" -> ngramJaccardSql,
    "dedup_minhash_sql" -> ngramJaccardSql,
    "dedup_simhash" ->
      ("WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents), " +
        "sh AS (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS s " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
        "h AS (SELECT doc_id, " + md5u("s") + " AS u FROM sh), " +
        "bits AS (SELECT doc_id, i, sum(CASE WHEN (u >> i) & 1 = 1 THEN 1 ELSE -1 END) AS c " +
        "FROM h, generate_series(0, 63) g(i) GROUP BY doc_id, i), " +
        "sk AS (SELECT doc_id, sum(CASE WHEN c > 0 THEN (1::UBIGINT << i) " +
        "ELSE 0::UBIGINT END)::UBIGINT AS u FROM bits GROUP BY doc_id) " +
        "SELECT a.doc_id AS a_id, b.doc_id AS b_id, " +
        "CAST(bit_count(xor(a.u, b.u)) AS BIGINT) AS hamming " +
        "FROM sk a JOIN sk b ON a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.u, b.u)) <= 3"),
    "dedup_embedding" ->
      ("WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "planted AS (SELECT vec_id + 100000 AS vec_id, " +
        "[CASE WHEN (i - 1) % 2 = 0 THEN v[i] * 1.1 ELSE v[i] * 0.9 END " +
        "for i in generate_series(1, len(v))] AS v FROM base WHERE vec_id < 50), " +
        "c AS (SELECT * FROM base UNION ALL SELECT * FROM planted) " +
        "SELECT a_id, b_id, round(raw, 4) AS cos FROM (" +
        "SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "list_cosine_similarity(a.v, b.v) AS raw " +
        "FROM c a JOIN c b ON a.vec_id < b.vec_id) WHERE raw >= 0.95"),
    "dedup_clusters" -> clustersSql,
    "dedup_clusters_big" -> clustersSql,
    "dedup_clusters_incr" -> clustersSql,
    "q_recursive_cte" ->
      ("WITH RECURSIVE anc(p, cur, depth) AS (" +
        "SELECT p_partkey, p_partkey, 0 FROM part UNION ALL " +
        "SELECT p, cur // 2, depth + 1 FROM anc WHERE cur > 1) " +
        "SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_parts " +
        "FROM anc WHERE cur = 1 GROUP BY depth"),
    "dedup_corpus" ->
      ("WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
        "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
        "pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter " +
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "pairs AS (SELECT a_id, b_id FROM pr JOIN sizes sa ON a_id = sa.doc_id " +
        "JOIN sizes sb ON b_id = sb.doc_id " +
        "WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7), " +
        "edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION SELECT b_id, a_id FROM pairs), " +
        "reach(u, v) AS (SELECT u, v FROM edges UNION " +
        "SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), " +
        "dropped AS (SELECT u AS doc_id FROM reach GROUP BY u HAVING least(u, min(v)) < u) " +
        "SELECT d.doc_id, md5(d.text) AS text_md5 FROM documents d " +
        "WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)"),
    // replays PQ: id-seeded codebooks (vec_id%16 partition means per
    // dim), per-(vec, subspace) argmin over the 16 codewords (L2,
    // lowest index on ties), error = sqrt of the summed minima
    "emb_pq" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "cent AS (SELECT vec_id % 16 AS b, i, avg(v[i]) AS c FROM v, " +
        "generate_series(1, 64) t(i) GROUP BY 1, 2), " +
        "d AS (SELECT x.vec_id, (t.i - 1) // 8 AS j, ce.b, " +
        "sum((x.v[t.i] - ce.c) * (x.v[t.i] - ce.c)) AS d2 " +
        "FROM v x, generate_series(1, 64) t(i) JOIN cent ce ON ce.i = t.i " +
        "GROUP BY 1, 2, ce.b), " +
        "best AS (SELECT vec_id, j, b, d2, row_number() OVER " +
        "(PARTITION BY vec_id, j ORDER BY d2, b) AS rn FROM d), " +
        "sel AS (SELECT vec_id, j, b, d2 FROM best WHERE rn = 1) " +
        "SELECT vec_id, " +
        (0 until 8).map(j =>
          s"CAST(max(CASE WHEN j = $j THEN b END) AS BIGINT) AS code_$j, ").mkString +
        "round(sqrt(sum(d2)), 4) AS err FROM sel GROUP BY vec_id"),
    // ADC search over the same codebooks/codes: a query scores a
    // corpus vector by codebook lookups only; ranking on the
    // 6-decimal-rounded distance (neighbor tie-break) matches the
    // engine ordering exactly
    "ann_pq" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "cent AS (SELECT vec_id % 16 AS b, i, avg(v[i]) AS c FROM v, " +
        "generate_series(1, 64) t(i) GROUP BY 1, 2), " +
        "d AS (SELECT x.vec_id, (t.i - 1) // 8 AS j, ce.b, " +
        "sum((x.v[t.i] - ce.c) * (x.v[t.i] - ce.c)) AS d2 " +
        "FROM v x, generate_series(1, 64) t(i) JOIN cent ce ON ce.i = t.i " +
        "GROUP BY 1, 2, ce.b), " +
        "best AS (SELECT vec_id, j, b, row_number() OVER " +
        "(PARTITION BY vec_id, j ORDER BY d2, b) AS rn FROM d), " +
        "code AS (SELECT vec_id, j, b FROM best WHERE rn = 1), " +
        "qd AS (SELECT q.vec_id AS query_id, co.vec_id AS neighbor_id, " +
        "sum((q.v[t.i] - ce.c) * (q.v[t.i] - ce.c)) AS raw " +
        "FROM v q, code co JOIN cent ce ON ce.b = co.b, generate_series(1, 64) t(i) " +
        "WHERE q.vec_id < 10 AND co.vec_id != q.vec_id " +
        "AND (t.i - 1) // 8 = co.j AND ce.i = t.i GROUP BY 1, 2) " +
        "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adist FROM (" +
        "SELECT query_id, neighbor_id, round(raw, 6) AS adist, " +
        "row_number() OVER (PARTITION BY query_id " +
        "ORDER BY round(raw, 6), neighbor_id) AS rank FROM qd) WHERE rank <= 5"),
    // ann_pq's code/ADC replay joined against the exact cosine top-5
    "ann_recall_pq" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "cent AS (SELECT vec_id % 16 AS b, i, avg(v[i]) AS c FROM v, " +
        "generate_series(1, 64) t(i) GROUP BY 1, 2), " +
        "d AS (SELECT x.vec_id, (t.i - 1) // 8 AS j, ce.b, " +
        "sum((x.v[t.i] - ce.c) * (x.v[t.i] - ce.c)) AS d2 " +
        "FROM v x, generate_series(1, 64) t(i) JOIN cent ce ON ce.i = t.i " +
        "GROUP BY 1, 2, ce.b), " +
        "best AS (SELECT vec_id, j, b, row_number() OVER " +
        "(PARTITION BY vec_id, j ORDER BY d2, b) AS rn FROM d), " +
        "code AS (SELECT vec_id, j, b FROM best WHERE rn = 1), " +
        "qd AS (SELECT q.vec_id AS query_id, co.vec_id AS neighbor_id, " +
        "sum((q.v[t.i] - ce.c) * (q.v[t.i] - ce.c)) AS raw " +
        "FROM v q, code co JOIN cent ce ON ce.b = co.b, generate_series(1, 64) t(i) " +
        "WHERE q.vec_id < 10 AND co.vec_id != q.vec_id " +
        "AND (t.i - 1) // 8 = co.j AND ce.i = t.i GROUP BY 1, 2), " +
        "pqtop AS (SELECT query_id, neighbor_id FROM (" +
        "SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY round(raw, 6), neighbor_id) AS rank FROM qd) WHERE rank <= 5), " +
        "ex AS (SELECT query_id, neighbor_id FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id) AS rank " +
        "FROM v q JOIN v c ON q.vec_id != c.vec_id WHERE q.vec_id < 10) " +
        "WHERE rank <= 5), " +
        "ov AS (SELECT ex.query_id, count(*) AS hits FROM ex " +
        "JOIN pqtop ON ex.query_id = pqtop.query_id " +
        "AND ex.neighbor_id = pqtop.neighbor_id GROUP BY 1) " +
        "SELECT q.vec_id AS query_id, coalesce(hits, 0) / 5.0 AS recall5 " +
        "FROM embeddings q LEFT JOIN ov ON q.vec_id = ov.query_id " +
        "WHERE q.vec_id < 10"),
    "ann_bruteforce" ->
      ("SELECT query_id, rank, neighbor_id, cos FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        "round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS cos, " +
        "CAST(row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, " +
        "c.vec_id) AS BIGINT) AS rank " +
        "FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id " +
        "WHERE q.vec_id < 10) WHERE rank <= 5"),
    "ann_filtered" ->
      ("SELECT query_id, rank, neighbor_id, cos FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        "round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS cos, " +
        "CAST(row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, " +
        "c.vec_id) AS BIGINT) AS rank " +
        "FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id " +
        "WHERE q.vec_id < 10 AND c.label = 3) WHERE rank <= 5"),
    "ann_mmr" -> mmrSql,
    // replays the deterministic IVF build: id%32 seed buckets → mean
    // centroids → nearest-centroid posting lists → 8-probe search
    "ann_ivf" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "d AS (SELECT vec_id % 32 AS _b, i, avg(v[i]) AS cv FROM v, " +
        "generate_series(1, 64) t(i) GROUP BY 1, 2), " +
        "cent AS (SELECT _b, list(cv ORDER BY i) AS centroid FROM d GROUP BY _b), " +
        "assign AS (SELECT vec_id, v, _b FROM (" +
        "SELECT x.vec_id, x.v, ct._b, row_number() OVER (PARTITION BY x.vec_id " +
        "ORDER BY list_cosine_similarity(x.v, ct.centroid) DESC, ct._b) AS rn " +
        "FROM v x, cent ct) WHERE rn = 1), " +
        "probes AS (SELECT vec_id AS query_id, v AS qv, _b FROM (" +
        "SELECT x.vec_id, x.v, ct._b, row_number() OVER (PARTITION BY x.vec_id " +
        "ORDER BY list_cosine_similarity(x.v, ct.centroid) DESC, ct._b) AS rn " +
        "FROM v x, cent ct WHERE x.vec_id < 10) WHERE rn <= 8), " +
        "cand AS (SELECT p.query_id, a.vec_id AS neighbor_id, " +
        "list_cosine_similarity(p.qv, a.v) AS cos FROM probes p " +
        "JOIN assign a ON p._b = a._b AND a.vec_id != p.query_id) " +
        "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cos, 4) AS cos " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cos DESC, neighbor_id) AS rank FROM cand) WHERE rank <= 5"),
    // IVF routing (ann_ivf's assign/probes) composed with PQ codes +
    // ADC scoring (ann_pq's codebooks) — each corpus vector lives in
    // exactly one list so each (query, neighbor) scores once
    "ann_ivfpq" -> ivfPqSql(""),
    // the persisted index is built from the same id-seeded quantizer,
    // so its answers are bit-identical to the in-memory ivfpq path
    "ann_index_persisted" -> ivfPqSql(""),
    // filtered search: the label predicate restricts CANDIDATES (top-k
    // over passing rows), replayed as a join on the labeled corpus
    "ann_index_filtered" -> ivfPqSql("",
      "JOIN embeddings em ON em.vec_id = a.vec_id AND em.label = 3 "),
    // frozen-quantizer maintenance: centroids/codebooks train on the
    // first 90% only; the appended 10% is encoded under them
    "ann_index_append" -> ivfPqSql(
      "WHERE vec_id < (SELECT (max(vec_id) + 1) * 9 // 10 FROM embeddings)"),
    // drift census: centroids from the 90% train set, mean cosine
    // assignment residual of the FULL corpus against them
    "ann_drift_residual" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "tv AS (SELECT * FROM v WHERE vec_id < " +
        "(SELECT (max(vec_id) + 1) * 9 // 10 FROM embeddings)), " +
        "d AS (SELECT vec_id % 32 AS _b, i, avg(v[i]) AS cv FROM tv, " +
        "generate_series(1, 64) t(i) GROUP BY 1, 2), " +
        "cent AS (SELECT _b, list(cv ORDER BY i) AS centroid FROM d GROUP BY _b), " +
        "assign AS (SELECT vec_id, cos FROM (" +
        "SELECT x.vec_id, list_cosine_similarity(x.v, ct.centroid) AS cos, " +
        "row_number() OVER (PARTITION BY x.vec_id " +
        "ORDER BY list_cosine_similarity(x.v, ct.centroid) DESC, ct._b) AS rn " +
        "FROM v x, cent ct) WHERE rn = 1) " +
        "SELECT count(*) AS n_vectors, round(avg(1.0 - cos), 4) AS mean_residual " +
        "FROM assign"),
    // requantized index ≡ an index freshly trained on the full corpus
    // with 3 Lloyd rounds (deterministic) — the refined IVF-PQ replay
    "ann_index_requantize" -> ivfPqSql("", refineRounds = 3),
    // mean summed squared distance at each vector's chosen PQ codes
    // (k=16 per-dim-mean codebooks, subdim 8) — the ADC self-distance
    "ann_pq_error" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "pcent AS (SELECT vec_id % 16 AS b, i, avg(v[i]) AS c FROM v, " +
        "generate_series(1, 64) t(i) GROUP BY 1, 2), " +
        "pd AS (SELECT x.vec_id, (t.i - 1) // 8 AS j, ce.b, " +
        "sum((x.v[t.i] - ce.c) * (x.v[t.i] - ce.c)) AS d2 " +
        "FROM v x, generate_series(1, 64) t(i) JOIN pcent ce ON ce.i = t.i " +
        "GROUP BY 1, 2, ce.b), " +
        "pbest AS (SELECT vec_id, j, b, d2, row_number() OVER " +
        "(PARTITION BY vec_id, j ORDER BY d2, b) AS rn FROM pd) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_vectors, " +
        "round(avg(e), 4) AS mean_pq_error FROM (" +
        "SELECT vec_id, sum(d2) AS e FROM pbest WHERE rn = 1 GROUP BY 1)"),
    // two deterministic retrains land the same refined quantizer —
    // same replay as ann_index_requantize; the Spark side crosses two
    // epoch generations on the way
    "ann_index_epoch" -> ivfPqSql("", refineRounds = 3),
    // replays the md5-plane LSH: ±1 weights from md5('lsh:t:b:i'),
    // 4 tables × 8-bit buckets, candidates ranked by exact cosine
    "ann_lsh" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "proj AS (SELECT t, b, list(CASE WHEN " +
        "('0x'||substr(md5('lsh:'||t||':'||b||':'||(i-1)), 1, 16))::UBIGINT & 1 = 1 " +
        "THEN 1.0 ELSE -1.0 END ORDER BY i) AS plane " +
        "FROM generate_series(0, 3) tt(t), generate_series(0, 7) bb(b), " +
        "generate_series(1, 64) ii(i) GROUP BY t, b), " +
        "sk AS (SELECT vec_id, t, CAST(sum(CASE WHEN d >= 0 THEN (1::BIGINT << b) " +
        "ELSE 0 END) AS BIGINT) AS bucket FROM (" +
        "SELECT x.vec_id, p.t, p.b, list_dot_product(x.v, p.plane) AS d " +
        "FROM v x, proj p) GROUP BY vec_id, t), " +
        "cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id " +
        "FROM sk q JOIN sk c ON q.t = c.t AND q.bucket = c.bucket " +
        "WHERE q.vec_id < 10 AND c.vec_id != q.vec_id), " +
        "scored AS (SELECT cand.query_id, cand.neighbor_id, " +
        "list_cosine_similarity(qv.v, cv.v) AS cos FROM cand " +
        "JOIN v qv ON qv.vec_id = cand.query_id " +
        "JOIN v cv ON cv.vec_id = cand.neighbor_id) " +
        "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cos, 4) AS cos " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cos DESC, neighbor_id) AS rank FROM scored) WHERE rank <= 5"),
    // ann_lsh's md5-hyperplane replay at 2 tables, with the query
    // side expanded to its exact bucket ∪ all Hamming-1 flips
    "ann_multiprobe" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "proj AS (SELECT t, b, list(CASE WHEN " +
        "('0x'||substr(md5('lsh:'||t||':'||b||':'||(i-1)), 1, 16))::UBIGINT & 1 = 1 " +
        "THEN 1.0 ELSE -1.0 END ORDER BY i) AS plane " +
        "FROM generate_series(0, 1) tt(t), generate_series(0, 7) bb(b), " +
        "generate_series(1, 64) ii(i) GROUP BY t, b), " +
        "sk AS (SELECT vec_id, t, CAST(sum(CASE WHEN d >= 0 THEN (1::BIGINT << b) " +
        "ELSE 0 END) AS BIGINT) AS bucket FROM (" +
        "SELECT x.vec_id, p.t, p.b, list_dot_product(x.v, p.plane) AS d " +
        "FROM v x, proj p) GROUP BY vec_id, t), " +
        "qprobe AS (SELECT vec_id, t, bucket FROM sk WHERE vec_id < 10 " +
        "UNION SELECT vec_id, t, xor(bucket, (1::BIGINT << i)) AS bucket " +
        "FROM sk, generate_series(0, 7) gi(i) WHERE vec_id < 10), " +
        "cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id " +
        "FROM qprobe q JOIN sk c ON q.t = c.t AND q.bucket = c.bucket " +
        "WHERE c.vec_id != q.vec_id), " +
        "scored AS (SELECT cand.query_id, cand.neighbor_id, " +
        "list_cosine_similarity(qv.v, cv.v) AS cos FROM cand " +
        "JOIN v qv ON qv.vec_id = cand.query_id " +
        "JOIN v cv ON cv.vec_id = cand.neighbor_id) " +
        "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cos, 4) AS cos " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cos DESC, neighbor_id) AS rank FROM scored) WHERE rank <= 5"),
    "ann_centroid" ->
      ("WITH d AS (SELECT label AS clabel, i, avg(embedding[i]) AS c FROM embeddings, " +
        "UNNEST(generate_series(1, 64)) t(i) GROUP BY 1, 2), " +
        "cent AS (SELECT clabel, list(c ORDER BY i) AS centroid FROM d GROUP BY 1), " +
        "scored AS (SELECT e.vec_id, e.label, c.clabel, " +
        "list_cosine_similarity(e.embedding::DOUBLE[], c.centroid) AS cos " +
        "FROM embeddings e, cent c), " +
        "best AS (SELECT vec_id, label, clabel, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn FROM scored) " +
        "SELECT label AS label_true, clabel AS label_pred, count(*) AS n " +
        "FROM best WHERE rn = 1 GROUP BY 1, 2"),
    "text_quality" -> qualitySql,
    // lower-median + MAD per source as explicit rank selection on the
    // (source, quality) count table — bit-reproducible across engines
    "text_quality_mad" ->
      ("WITH ql AS (" + qualitySql + "), " +
        "qq AS (SELECT d.source, ql.quality AS q FROM documents d " +
        "JOIN ql ON d.doc_id = ql.doc_id), " +
        "c AS (SELECT source, q, count(*) AS c FROM qq GROUP BY 1, 2), " +
        "cc AS (SELECT source, q, c, sum(c) OVER (PARTITION BY source ORDER BY q " +
        "ROWS UNBOUNDED PRECEDING) AS cum, sum(c) OVER (PARTITION BY source) AS n FROM c), " +
        "med AS (SELECT source, min(q) AS med FROM cc " +
        "WHERE cum >= ceil(n / 2.0) GROUP BY source), " +
        "d AS (SELECT c.source, med.med, abs(c.q - med.med) AS dev, sum(c.c) AS c " +
        "FROM c JOIN med USING (source) GROUP BY 1, 2, 3), " +
        "dc AS (SELECT source, med, dev, c, sum(c) OVER (PARTITION BY source ORDER BY dev " +
        "ROWS UNBOUNDED PRECEDING) AS cum, sum(c) OVER (PARTITION BY source) AS n FROM d), " +
        "mad AS (SELECT source, min(dev) AS mad FROM dc " +
        "WHERE cum >= ceil(n / 2.0) GROUP BY source) " +
        "SELECT d.source, CAST(sum(d.c) AS BIGINT) AS n_docs, " +
        "CAST(coalesce(sum(d.c) FILTER (d.dev > 3.0 * mad.mad), 0) AS BIGINT) AS n_outliers, " +
        "round(min(d.med), 6) AS median_q, round(min(mad.mad), 6) AS mad_q " +
        "FROM d JOIN mad USING (source) GROUP BY 1"),
    "text_gopher_census" -> gopherCensusSql,
    "text_langid" -> langidSql,
    // classifier QA: label×prediction cells off the shared langid CTE
    "text_langid_confusion" ->
      ("WITH pl AS (" + langidSql + ") " +
        "SELECT d.lang, pl.pred_lang, count(*) AS n_docs " +
        "FROM documents d JOIN pl USING (doc_id) GROUP BY 1, 2"),
    // add-α bigram LM, replayed with the identical count tables and
    // smoothing arithmetic (docs with < 2 tokens have no bigrams and
    // drop from both engines)
    "text_bigram_lm" ->
      ("WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents), " +
        "bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM tok, " +
        "UNNEST(generate_series(1, len(w) - 1)) AS t(i)), " +
        "c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2), " +
        "c1 AS (SELECT w1 AS cw, sum(c12) AS c1 FROM c12 GROUP BY 1), " +
        "vs AS (SELECT count(*) * 1.0 AS v FROM c1), " +
        "sc AS (SELECT bg.doc_id, -ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * vs.v)) AS nll " +
        "FROM bg JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2 " +
        "JOIN c1 ON bg.w1 = c1.cw, vs) " +
        "SELECT doc_id, count(*) AS n_bigrams, round(avg(nll), 4) AS bigram_nll " +
        "FROM sc GROUP BY doc_id"),
    // hashed linear classifier: bucket = low 10 bits of md5lo64
    // (= last 4 hex chars of the first 8 md5 bytes mod 1024); the
    // label compares the exact ordered fold, not the rounded sigmoid
    "text_calibration" ->
      ("WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w " +
        "FROM documents), " +
        "sc AS (SELECT doc_id, len(w) AS n, list_reduce(list_prepend(0.0, " +
        "list_transform(w, x -> ((((('0x'||substr(md5(x),13,4))::UBIGINT % 1024)" +
        "::BIGINT * 2654435761 + 7) % 2000001) / 1000000.0 - 1.0))), " +
        "(a, b) -> a + b) AS wsum FROM tok), " +
        "clf AS (SELECT doc_id, round(1.0 / (1.0 + exp(-(wsum / n))), 4) " +
        "AS clf_score FROM sc), " +
        "m AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens, " +
        "round(len(list_filter(string_split(lower(text), ' '), x -> x IN " +
        stopwordsSql + ")) * 1.0 / len(string_split(lower(text), ' ')), 4) " +
        "AS stopword_ratio, " +
        "round(len(list_distinct(string_split(lower(text), ' '))) * 1.0 / " +
        "len(string_split(lower(text), ' ')), 4) AS distinct_ratio " +
        "FROM documents), " +
        "q AS (SELECT doc_id, round(least(n_tokens / 64.0, 1.0) * 0.4 " +
        "+ least(stopword_ratio * 5.0, 1.0) * 0.2 + distinct_ratio * 0.4, 6) " +
        "AS quality FROM m), " +
        "j AS (SELECT clf.clf_score, (q.quality >= 0.5) AS target " +
        "FROM clf JOIN q USING (doc_id)) " +
        "SELECT CAST(least(floor(clf_score * 10), 9) AS BIGINT) AS decile, " +
        "count(*) AS n, round(avg(clf_score), 6) AS mean_score, " +
        "round(avg(CASE WHEN target THEN 1.0 ELSE 0.0 END), 6) AS pos_rate " +
        "FROM j GROUP BY 1"),
    "text_auc" ->
      ("WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w " +
        "FROM documents), " +
        "sc AS (SELECT doc_id, len(w) AS n, list_reduce(list_prepend(0.0, " +
        "list_transform(w, x -> ((((('0x'||substr(md5(x),13,4))::UBIGINT % 1024)" +
        "::BIGINT * 2654435761 + 7) % 2000001) / 1000000.0 - 1.0))), " +
        "(a, b) -> a + b) AS wsum FROM tok), " +
        "clf AS (SELECT doc_id, round(1.0 / (1.0 + exp(-(wsum / n))), 4) " +
        "AS clf_score FROM sc), " +
        "m AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens, " +
        "round(len(list_filter(string_split(lower(text), ' '), x -> x IN " +
        stopwordsSql + ")) * 1.0 / len(string_split(lower(text), ' ')), 4) " +
        "AS stopword_ratio, " +
        "round(len(list_distinct(string_split(lower(text), ' '))) * 1.0 / " +
        "len(string_split(lower(text), ' ')), 4) AS distinct_ratio " +
        "FROM documents), " +
        "q AS (SELECT doc_id, round(least(n_tokens / 64.0, 1.0) * 0.4 " +
        "+ least(stopword_ratio * 5.0, 1.0) * 0.2 + distinct_ratio * 0.4, 6) " +
        "AS quality FROM m), " +
        "j AS (SELECT clf.clf_score AS s, " +
        "CASE WHEN q.quality >= 0.5 THEN 1 ELSE 0 END AS t " +
        "FROM clf JOIN q USING (doc_id)), " +
        "g AS (SELECT s, count(*) AS n, sum(t) AS np FROM j GROUP BY s), " +
        "r AS (SELECT np, n, (2 * coalesce(sum(n) OVER (ORDER BY s " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n + 1) / 2.0 " +
        "AS midrank FROM g) " +
        "SELECT round((sum(np * midrank) - sum(np) * (sum(np) + 1) / 2.0) " +
        "/ (sum(np) * sum(n - np)), 6) AS auc, " +
        "CAST(sum(np) AS BIGINT) AS n_pos, " +
        "CAST(sum(n - np) AS BIGINT) AS n_neg FROM r"),
    "text_classify_eval" ->
      ("WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w " +
        "FROM documents), " +
        "sc AS (SELECT doc_id, list_reduce(list_prepend(0.0, " +
        "list_transform(w, x -> ((((('0x'||substr(md5(x),13,4))::UBIGINT % 1024)" +
        "::BIGINT * 2654435761 + 7) % 2000001) / 1000000.0 - 1.0))), " +
        "(a, b) -> a + b) AS wsum FROM tok), " +
        "clf AS (SELECT doc_id, wsum >= 0 AS pred FROM sc), " +
        "m AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens, " +
        "round(len(list_filter(string_split(lower(text), ' '), x -> x IN " +
        stopwordsSql + ")) * 1.0 / len(string_split(lower(text), ' ')), 4) " +
        "AS stopword_ratio, " +
        "round(len(list_distinct(string_split(lower(text), ' '))) * 1.0 / " +
        "len(string_split(lower(text), ' ')), 4) AS distinct_ratio " +
        "FROM documents), " +
        "q AS (SELECT doc_id, round(least(n_tokens / 64.0, 1.0) * 0.4 " +
        "+ least(stopword_ratio * 5.0, 1.0) * 0.2 + distinct_ratio * 0.4, 6) " +
        ">= 0.5 AS target FROM m), " +
        // CAST: DuckDB integer sum() is HUGEINT (→ float64 in parquet);
        // Spark writes int64 — cast so the driver's typed hash matches
        "c AS (SELECT CAST(sum(CASE WHEN pred AND target THEN 1 ELSE 0 END) AS BIGINT) AS tp, " +
        "CAST(sum(CASE WHEN pred AND NOT target THEN 1 ELSE 0 END) AS BIGINT) AS fp, " +
        "CAST(sum(CASE WHEN NOT pred AND target THEN 1 ELSE 0 END) AS BIGINT) AS fn, " +
        "CAST(sum(CASE WHEN NOT pred AND NOT target THEN 1 ELSE 0 END) AS BIGINT) AS tn " +
        "FROM clf JOIN q USING (doc_id)) " +
        "SELECT tp, fp, fn, tn, " +
        "round(tp * 1.0 / (tp + fp), 6) AS precision, " +
        "round(tp * 1.0 / (tp + fn), 6) AS recall, " +
        "round(tp * 2.0 / (tp * 2 + fp + fn), 6) AS f1, " +
        "round((tp + tn) * 1.0 / (tp + fp + fn + tn), 6) AS accuracy, " +
        "round(((tp + tn) * 1.0 / (tp + fp + fn + tn) " +
        "- ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) * 1.0 " +
        "/ ((tp + fp + fn + tn) * (tp + fp + fn + tn))) " +
        "/ (1.0 - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) * 1.0 " +
        "/ ((tp + fp + fn + tn) * (tp + fp + fn + tn))), 6) AS kappa FROM c"),
    "text_classify" -> classifySql,
    // same oracle: the table-driven path must score identically to
    // the inline-stub path (the model-swap contract, proven in code)
    "text_classify_table" -> classifySql,
    // trained multinomial NB, fit AND scoring replayed end-to-end:
    // smoothing arithmetic is exact-integer until the final ln, and
    // scores round to 6dp BEFORE the argmax on both engines; empty
    // tokens (irregular whitespace) are dropped at tokenization on
    // both sides, and scoring runs from the doc x label universe so
    // an all-OOV held-out doc gets a prior-only argmax, not dropped
    "text_nb_classify" ->
      ("WITH train AS (SELECT source AS label, lower(text) AS t " +
        "FROM documents WHERE doc_id % 5 <> 0 " +
        "UNION ALL SELECT 'rare_src', 'jjjuniqjjj kkkuniqkkk'), " +
        "tokt AS (SELECT label, token FROM (SELECT label, " +
        "unnest(string_split(t, ' ')) AS token FROM train) WHERE token <> ''), " +
        "vocab AS (SELECT token FROM (SELECT token, count(*) AS c FROM tokt " +
        "GROUP BY 1) WHERE c >= 2), " +
        "counts AS (SELECT label, token, count(*) AS n FROM tokt " +
        "JOIN vocab USING (token) GROUP BY 1, 2), " +
        "labels AS (SELECT label, count(*) AS docs FROM train GROUP BY 1), " +
        // dense grid covers EVERY trained label: a label with no
        // in-vocab tokens gets tn=0 (uniform smoothed 1/V per token)
        "tot AS (SELECT labels.label, coalesce(ct.tn, 0) AS tn FROM labels " +
        "LEFT JOIN (SELECT label, sum(n) AS tn FROM counts GROUP BY 1) ct " +
        "USING (label)), " +
        "v AS (SELECT count(*) AS vs FROM vocab), " +
        "model AS (SELECT tot.label, vocab.token, " +
        "ln((coalesce(c.n, 0) + 1.0) / (tot.tn + v.vs)) AS lp " +
        "FROM tot CROSS JOIN vocab CROSS JOIN v " +
        "LEFT JOIN counts c ON c.label = tot.label AND c.token = vocab.token), " +
        "prior AS (SELECT label, ln(docs * 1.0 / (SELECT sum(docs) FROM labels)) " +
        "AS lprior FROM labels), " +
        "testraw AS (SELECT doc_id, source, lower(text) AS t " +
        "FROM documents WHERE doc_id % 5 = 0 " +
        "UNION ALL SELECT -1, 'oov_probe', 'zqzqzqzq xvxvxvxv'), " +
        "testdocs AS (SELECT doc_id, source FROM testraw), " +
        "test AS (SELECT doc_id, token FROM (SELECT doc_id, " +
        "unnest(string_split(t, ' ')) AS token FROM testraw) " +
        "WHERE token <> ''), " +
        "sc AS (SELECT t.doc_id, m.label, sum(m.lp) AS s " +
        "FROM test t JOIN model m USING (token) GROUP BY 1, 2), " +
        "scored AS (SELECT d.doc_id, d.source, p.label, " +
        "round(coalesce(sc.s, 0) + p.lprior, 6) AS score " +
        "FROM testdocs d CROSS JOIN prior p " +
        "LEFT JOIN sc ON sc.doc_id = d.doc_id AND sc.label = p.label), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY score DESC, label) AS rn FROM scored) " +
        "SELECT doc_id, source, label AS pred, score, " +
        "CAST(label = source AS BIGINT) AS correct FROM r WHERE rn = 1"),
    "text_langid_table" -> langidSql,
    // near-dup clusters resolved to their best-quality representative
    "dedup_keep_best" ->
      ("SELECT cluster_id, doc_id AS kept_doc_id, quality AS kept_quality, " +
        "nm AS n_members, nm - 1 AS n_dropped FROM (" +
        "SELECT cl.cluster_id, cl.doc_id, q.quality, " +
        "row_number() OVER (PARTITION BY cl.cluster_id " +
        "ORDER BY q.quality DESC, cl.doc_id) AS rn, " +
        "count(*) OVER (PARTITION BY cl.cluster_id) AS nm " +
        "FROM (" + clustersSql + ") cl JOIN (" + qualitySql + ") q " +
        "ON cl.doc_id = q.doc_id) WHERE rn = 1"),
    // deterministic 8/1/1 split: low 14 bits of md5("split:"+id) mod 10
    "corpus_split" ->
      ("SELECT source, CASE " +
        "WHEN (('0x'||substr(md5('split:'||doc_id), 13, 4))::UINTEGER % 16384) % 10 <= 7 THEN 'train' " +
        "WHEN (('0x'||substr(md5('split:'||doc_id), 13, 4))::UINTEGER % 16384) % 10 = 8 THEN 'val' " +
        "ELSE 'test' END AS split, count(*) AS n_docs, " +
        "CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens " +
        "FROM documents GROUP BY 1, 2"),
    "corpus_split_stratified" ->
      ("WITH r AS (SELECT source, " +
        "row_number() OVER (PARTITION BY source ORDER BY md5('ssplit:'||doc_id)) AS rn, " +
        "count(*) OVER (PARTITION BY source) AS n FROM documents) " +
        "SELECT source, CASE WHEN rn <= floor(0.8 * n) THEN 'train' " +
        "WHEN rn <= floor(0.9 * n) THEN 'val' ELSE 'test' END AS split, " +
        "count(*) AS n_docs FROM r GROUP BY 1, 2"),
    "q_observe_metrics" ->
      ("SELECT count(*) AS n_docs, " +
        "CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens " +
        "FROM documents"),
    // the shard gate is the corpus_split md5-bucket idiom; the xor
    // checksum wraps the unsigned md5 prefix back to signed two's
    // complement so both engines land on the same BIGINT
    "corpus_shard_manifest" ->
      ("SELECT CAST((('0x'||substr(md5('shard:'||doc_id), 13, 4))::UINTEGER % 16384) % 16 AS BIGINT) AS shard, " +
        "count(*) AS n_docs, " +
        "CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens, " +
        "CAST(sum(length(text)) AS BIGINT) AS n_chars, " +
        wrapSigned("bit_xor(('0x'||substr(md5(doc_id::VARCHAR), 1, 16))::UBIGINT)") +
        " AS id_checksum FROM documents GROUP BY 1"),
    // recrawl delta: full-outer join of the two hash-carved snapshots on
    // (id, md5(text)) projections, statuses counted per source
    "corpus_diff" ->
      ("WITH b AS (SELECT doc_id, source, text, " +
        "(('0x'||substr(md5('snap:'||doc_id), 13, 4))::UINTEGER % 16384) AS bk FROM documents), " +
        "prev AS (SELECT doc_id, md5(text) AS h FROM b WHERE bk % 20 != 0), " +
        "nxt AS (SELECT doc_id, md5(CASE WHEN bk % 17 = 2 THEN text || ' [updated]' " +
        "ELSE text END) AS h FROM b WHERE bk % 23 != 1), " +
        "d AS (SELECT coalesce(p.doc_id, n.doc_id) AS doc_id, " +
        "CASE WHEN p.doc_id IS NULL THEN 'added' WHEN n.doc_id IS NULL THEN 'removed' " +
        "WHEN p.h != n.h THEN 'changed' ELSE 'unchanged' END AS status " +
        "FROM prev p FULL OUTER JOIN nxt n ON p.doc_id = n.doc_id) " +
        "SELECT b.source, d.status, count(*) AS n_docs " +
        "FROM d JOIN b USING (doc_id) GROUP BY 1, 2"),
    // incremental-maintenance proof: the oracle aggregates the next
    // snapshot DIRECTLY; the engine merges the prev view with delta aggs
    "corpus_incr_stats" ->
      ("WITH b AS (SELECT doc_id, source, text, " +
        "(('0x'||substr(md5('snap:'||doc_id), 13, 4))::UINTEGER % 16384) AS bk FROM documents), " +
        "nxt AS (SELECT doc_id, source, CASE WHEN bk % 17 = 2 THEN text || ' [updated]' " +
        "ELSE text END AS text FROM b WHERE bk % 23 != 1) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens " +
        "FROM nxt GROUP BY 1"),
    // CDC apply: the oracle builds the next snapshot directly; the
    // engine reproduces it by merging prev with the delete/upsert delta
    "corpus_apply_delta" ->
      ("WITH b AS (SELECT doc_id, source, text, " +
        "(('0x'||substr(md5('snap:'||doc_id), 13, 4))::UINTEGER % 16384) AS bk FROM documents), " +
        "nxt AS (SELECT doc_id, source, CASE WHEN bk % 17 = 2 THEN text || ' [updated]' " +
        "ELSE text END AS text FROM b WHERE bk % 23 != 1) " +
        "SELECT doc_id, source, md5(text) AS text_md5 FROM nxt"),
    // A-ES weighted sample: u from the low-63 md5 bits, key=round6(ln(u)/w),
    // top-20 per source by (key DESC, doc_id) — selection and key replay
    "corpus_weighted_sample" ->
      ("WITH w AS (SELECT source, doc_id, " +
        "greatest(len(string_split(lower(text), ' '))::DOUBLE, 1.0) AS wt, " +
        "((" + md5u("'ws:'||doc_id") + " & 9223372036854775807::UBIGINT)::DOUBLE + 1.0) " +
        "/ 9.223372036854776e18 AS u FROM documents), " +
        "r AS (SELECT source, doc_id, round(ln(u)/wt, 6) AS ws_key, " +
        "row_number() OVER (PARTITION BY source " +
        "ORDER BY round(ln(u)/wt, 6) DESC, doc_id) AS rn FROM w) " +
        "SELECT source, doc_id, ws_key FROM r WHERE rn <= 20"),
    // fuzzy-ER pairs: planted typo twins recovered through first-token
    // + length-band blocking and exact Levenshtein verification
    "er_editdist" ->
      ("WITH base AS (SELECT p_partkey AS id, p_name AS s FROM part " +
        "UNION ALL SELECT p_partkey + 1000000, " +
        "substr(p_name, 1, length(p_name) - 1) || 'x' FROM part WHERE p_partkey % 100 = 0), " +
        "b AS (SELECT id, s, string_split(s, ' ')[1] || " +
        "substr(string_split(s, ' ')[-1], 1, 1) AS blk FROM base) " +
        "SELECT a.id AS a_id, bb.id AS b_id, " +
        "CAST(levenshtein(a.s, bb.s) AS BIGINT) AS dist " +
        "FROM b a JOIN b bb ON a.blk = bb.blk AND a.id < bb.id " +
        "AND abs(length(a.s) - length(bb.s)) <= 2 " +
        "WHERE levenshtein(a.s, bb.s) <= 2"),
    // Fellegi–Sunter replay with the same precomputed round6'd weight
    // literals the engine sums (ln() differs across engines in the
    // last ulp; literal constants don't)
    "er_fellegi_sunter" -> {
      val (_, w1a, w1d) = fsFields(0)
      val (_, w2a, w2d) = fsFields(1)
      val (_, w3a, w3d) = fsFields(2)
      "WITH c AS (SELECT c_custkey, c_nationkey || '|' || c_mktsegment AS blk, " +
        "floor(c_acctbal / 1000) AS bal_band, right(c_name, 1) AS name_tail, " +
        "CAST(round(c_acctbal * 100) AS BIGINT) % 10 AS cent_band FROM customer), " +
        // CAST: the literal-weight sum rounds to DECIMAL(9,6) in DuckDB
        "p AS (SELECT CAST(round(" +
        s"(CASE WHEN a.bal_band = b.bal_band THEN $w1a ELSE $w1d END) + " +
        s"(CASE WHEN a.name_tail = b.name_tail THEN $w2a ELSE $w2d END) + " +
        s"(CASE WHEN a.cent_band = b.cent_band THEN $w3a ELSE $w3d END), 6) " +
        "AS DOUBLE) AS score " +
        "FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey) " +
        "SELECT score, CASE WHEN score >= 3.0 THEN 'match' " +
        "WHEN score > 0.0 THEN 'possible' ELSE 'non_match' END AS verdict, " +
        "count(*) AS n_pairs FROM p GROUP BY 1, 2"
    },
    // full EM replay: agreement-combo counts, 5 chained E/M rounds
    // with ordered list_sums and round6 per step, final posteriors
    "er_em_params" ->
      ("WITH c AS (SELECT c_custkey, c_nationkey || '|' || c_mktsegment AS blk, " +
        "floor(c_acctbal / 1000) AS bal_band, right(c_name, 1) AS name_tail, " +
        "CAST(round(c_acctbal * 100) AS BIGINT) % 10 AS cent_band FROM customer), " +
        "combos AS (SELECT " +
        "CASE WHEN a.bal_band = b.bal_band THEN 1 ELSE 0 END AS a0, " +
        "CASE WHEN a.name_tail = b.name_tail THEN 1 ELSE 0 END AS a1, " +
        "CASE WHEN a.cent_band = b.cent_band THEN 1 ELSE 0 END AS a2, " +
        "count(*) AS n FROM c a JOIN c b ON a.blk = b.blk " +
        "AND a.c_custkey < b.c_custkey GROUP BY 1, 2, 3), " +
        "e0 AS (SELECT 0.1::DOUBLE AS lambda, 0.8::DOUBLE AS m0, 0.2::DOUBLE AS u0, " +
        "0.8::DOUBLE AS m1, 0.2::DOUBLE AS u1, 0.8::DOUBLE AS m2, 0.2::DOUBLE AS u2), " +
        emIter("e1", "e0") + emIter("e2", "e1") + emIter("e3", "e2") +
        emIter("e4", "e3") + emIter("e5", "e4").stripSuffix(", ") +
        " SELECT CAST(a0 AS BIGINT) AS ag_0, CAST(a1 AS BIGINT) AS ag_1, " +
        "CAST(a2 AS BIGINT) AS ag_2, CAST(n AS BIGINT) AS n_pairs, " +
        "round(" + emPost("e5") + ", 6) AS p_match, e5.lambda, " +
        "e5.m0 AS m_0, e5.u0 AS u_0, e5.m1 AS m_1, e5.u1 AS u_1, " +
        "e5.m2 AS m_2, e5.u2 AS u_2 FROM combos, e5"),
    // full ER-pipeline replay: EM trajectory → per-pair learned
    // posterior → matched edges → recursive closure → cluster census
    "pipeline_linkage" ->
      ("WITH RECURSIVE c AS (SELECT c_custkey, c_nationkey || '|' || c_mktsegment AS blk, " +
        "floor(c_acctbal / 1000) AS bal_band, right(c_name, 1) AS name_tail, " +
        "CAST(round(c_acctbal * 100) AS BIGINT) % 10 AS cent_band FROM customer), " +
        "combos AS (SELECT " +
        "CASE WHEN a.bal_band = b.bal_band THEN 1 ELSE 0 END AS a0, " +
        "CASE WHEN a.name_tail = b.name_tail THEN 1 ELSE 0 END AS a1, " +
        "CASE WHEN a.cent_band = b.cent_band THEN 1 ELSE 0 END AS a2, " +
        "count(*) AS n FROM c a JOIN c b ON a.blk = b.blk " +
        "AND a.c_custkey < b.c_custkey GROUP BY 1, 2, 3), " +
        "e0 AS (SELECT 0.1::DOUBLE AS lambda, 0.8::DOUBLE AS m0, 0.2::DOUBLE AS u0, " +
        "0.8::DOUBLE AS m1, 0.2::DOUBLE AS u1, 0.8::DOUBLE AS m2, 0.2::DOUBLE AS u2), " +
        emIter("e1", "e0") + emIter("e2", "e1") + emIter("e3", "e2") +
        emIter("e4", "e3") + emIter("e5", "e4") +
        "pr AS (SELECT a.c_custkey AS a_id, b.c_custkey AS b_id, " +
        "CASE WHEN a.bal_band = b.bal_band THEN 1 ELSE 0 END AS a0, " +
        "CASE WHEN a.name_tail = b.name_tail THEN 1 ELSE 0 END AS a1, " +
        "CASE WHEN a.cent_band = b.cent_band THEN 1 ELSE 0 END AS a2 " +
        "FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey), " +
        // round6 the posterior BEFORE the threshold, matching the Spark
        // side's round6'd p_match — both engines compare the same
        // discretized value even for posteriors within an ulp of 0.4
        "matched AS (SELECT a_id, b_id FROM pr, e5 WHERE round(" + emPost("e5") + ", 6) > 0.4), " +
        "edges AS (SELECT a_id AS u, b_id AS v FROM matched " +
        "UNION SELECT b_id, a_id FROM matched), " +
        "reach(u, v) AS (SELECT u, v FROM edges UNION " +
        "SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), " +
        "asg AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id " +
        "FROM reach GROUP BY u) " +
        "SELECT cluster_id, count(*) AS n_members FROM asg GROUP BY cluster_id"),
    // UNBLOCKED all-pairs set cosine: equality with the engine's
    // prefix-filtered run proves AllPairs blocking is lossless
    "er_cosine" ->
      ("WITH base AS (SELECT p_partkey AS id, p_name AS s FROM part " +
        "UNION ALL SELECT p_partkey + 1000000, " +
        "substr(p_name, 1, length(p_name) - 1) || 'x' FROM part WHERE p_partkey % 100 = 0), " +
        "w AS (SELECT id, string_split(lower(s), ' ') AS w FROM base), " +
        "tok AS (SELECT DISTINCT id, array_to_string(w[i:i+1], ' ') AS tok " +
        "FROM w, UNNEST(generate_series(1, greatest(len(w) - 1, 0))) AS g(i)), " +
        "sz AS (SELECT id, count(*) AS n FROM tok GROUP BY id), " +
        "i AS (SELECT a.id AS a_id, b.id AS b_id, count(*) AS inter " +
        "FROM tok a JOIN tok b ON a.tok = b.tok AND a.id < b.id GROUP BY 1, 2) " +
        "SELECT a_id, b_id, round(inter / sqrt(sa.n * sb.n), 4) AS cos " +
        "FROM i JOIN sz sa ON a_id = sa.id JOIN sz sb ON b_id = sb.id " +
        "WHERE round(inter / sqrt(sa.n * sb.n), 4) >= 0.7"),
    // per-source unigram KL drift vs the corpus distribution
    "corpus_source_kl" ->
      ("WITH tok AS (SELECT source, unnest(string_split(lower(text), ' ')) AS t FROM documents), " +
        "st AS (SELECT source, t, count(*) AS c_st FROM tok GROUP BY 1, 2), " +
        "stot AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_tokens, " +
        "count(*) AS n_types FROM st GROUP BY 1), " +
        "ct AS (SELECT t, count(*) AS c_t FROM tok GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(c_t) AS DOUBLE) AS tot FROM ct) " +
        "SELECT st.source, stot.n_tokens, stot.n_types, " +
        "round(sum((c_st * 1.0 / stot.n_tokens) * " +
        "ln((c_st * 1.0 / stot.n_tokens) / (c_t / tot.tot))), 4) AS kl " +
        "FROM st JOIN stot USING(source) JOIN ct USING(t), tot GROUP BY 1, 2, 3"),
    // per-doc top-3 jaccard neighbors (rank cut, no threshold)
    "text_jaccard_knn" ->
      ("WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
        "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
        "pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter " +
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "j AS (SELECT a_id, b_id, round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard " +
        "FROM pr JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id), " +
        "sym AS (SELECT a_id AS doc_id, b_id AS nbr_id, jaccard FROM j " +
        "UNION ALL SELECT b_id, a_id, jaccard FROM j), " +
        "r AS (SELECT doc_id, nbr_id, jaccard, row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY jaccard DESC, nbr_id) AS rn FROM sym) " +
        "SELECT doc_id, nbr_id, jaccard FROM r WHERE rn <= 3"),
    // per-doc token entropy; the type fold runs over SORTED distinct
    // types so both engines sum identical doubles in identical order
    "text_entropy" ->
      ("WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents), " +
        "e AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, " +
        "CAST(len(list_distinct(w)) AS BIGINT) AS n_types, " +
        "-list_reduce(list_prepend(0.0, list_transform(list_sort(list_distinct(w)), " +
        "t -> (len(list_filter(w, x -> x = t)) * 1.0 / len(w)) * " +
        "ln(len(list_filter(w, x -> x = t)) * 1.0 / len(w)))), " +
        "(a, b) -> a + b) AS h FROM tok) " +
        "SELECT doc_id, n_tokens, n_types, round(h, 4) AS entropy FROM e"),
    // deterministic round-robin interleave: pos = (rank-1)*|sources|+sidx
    "corpus_interleave" ->
      ("WITH s AS (SELECT source, row_number() OVER (ORDER BY source) - 1 AS sidx " +
        "FROM (SELECT DISTINCT source FROM documents)), " +
        "n AS (SELECT count(*) AS nsrc FROM s), " +
        "r AS (SELECT doc_id, source, row_number() OVER " +
        "(PARTITION BY source ORDER BY doc_id) AS rr FROM documents) " +
        "SELECT (rr - 1) * nsrc + sidx AS pos, doc_id, source " +
        "FROM r JOIN s USING(source), n ORDER BY pos LIMIT 100"),
    // per-doc duplication fraction over distinct 5-gram shingles
    // (engine joins 8-byte shingle hashes; collision-free at fixture
    // scale, same assumption as the jaccard oracles)
    "text_dup_fraction" ->
      ("WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
        "dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1), " +
        "j AS (SELECT sh.doc_id, dfreq.df FROM sh JOIN dfreq ON sh.shingle = dfreq.shingle) " +
        "SELECT doc_id, count(*) AS n_shingles, " +
        "CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup, " +
        "round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS dup_frac " +
        "FROM j GROUP BY doc_id"),
    // source×source distinct-shared-shingle counts
    "corpus_overlap_matrix" ->
      ("WITH tok AS (SELECT source, string_split(text, ' ') AS w FROM documents), " +
        "sh AS (SELECT DISTINCT source, array_to_string(w[i:i+4], ' ') AS shingle " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)) " +
        "SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared " +
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source " +
        "GROUP BY 1, 2"),
    // per-source rank cut (the discrete top-p% quality gate)
    "corpus_quality_topk" ->
      ("WITH src AS (SELECT d.source, qq.doc_id, qq.quality FROM (" + qualitySql + ") qq " +
        "JOIN documents d ON qq.doc_id = d.doc_id), " +
        "r AS (SELECT source, doc_id, quality, row_number() OVER " +
        "(PARTITION BY source ORDER BY quality DESC, doc_id) AS rn FROM src) " +
        "SELECT source, doc_id, quality FROM r WHERE rn <= 25"),
    // per-domain cap: deterministic-random keep-N per source
    "corpus_domain_cap" ->
      ("WITH k AS (SELECT source, doc_id, " +
        "(('0x'||substr(md5('cap:'||doc_id), 1, 16))::UBIGINT & 16383) AS pri FROM documents), " +
        "r AS (SELECT source, doc_id, row_number() OVER " +
        "(PARTITION BY source ORDER BY pri, doc_id) AS rn FROM k) " +
        "SELECT source, doc_id FROM r WHERE rn <= 15"),
    // token-budget cap: exclusive prefix sum in priority order, soft
    // cap (the crossing doc admits)
    "corpus_domain_token_cap" ->
      ("WITH k AS (SELECT source, doc_id, " +
        "(('0x'||substr(md5('cap:'||doc_id), 1, 16))::UBIGINT & 16383) AS pri, " +
        "len(string_split(lower(text), ' ')) AS ntok FROM documents), " +
        "r AS (SELECT source, ntok, coalesce(sum(ntok) OVER " +
        "(PARTITION BY source ORDER BY pri, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before FROM k) " +
        "SELECT source, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens " +
        "FROM r WHERE tok_before < 500 GROUP BY source"),
    // epoch shuffle: (epoch, doc) → shard + in-shard position, md5-driven
    "corpus_epoch_shuffle" ->
      ("WITH e AS (SELECT 0 AS epoch UNION ALL SELECT 1), " +
        "a AS (SELECT d.doc_id, e.epoch, " +
        "(('0x'||substr(md5('ep'||e.epoch||':'||d.doc_id), 1, 16))::UBIGINT & 16383) AS h " +
        "FROM documents d CROSS JOIN e) " +
        "SELECT CAST(epoch AS BIGINT) AS epoch, CAST(h % 8 AS BIGINT) AS shard, " +
        "CAST(row_number() OVER (PARTITION BY epoch, h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos, " +
        "doc_id FROM a"),
    // curriculum: per-shard positions by (quality band desc, hash)
    "corpus_curriculum" ->
      ("WITH q AS (" + qualitySql + "), " +
        "k AS (SELECT doc_id, CAST(floor(q.quality * 4) AS BIGINT) AS band, " +
        "(('0x'||substr(md5('cur:'||doc_id), 1, 16))::UBIGINT & 16383) AS h FROM q) " +
        "SELECT CAST(h % 8 AS BIGINT) AS shard, " +
        "CAST(row_number() OVER (PARTITION BY h % 8 " +
        "ORDER BY band DESC, h, doc_id) AS BIGINT) AS pos, band, doc_id FROM k"),
    // the full train-prep chain replayed: quality CTE → per-source
    // rank cap → md5 shard hash → per-shard manifest
    "pipeline_train_prep" ->
      ("WITH q AS (" + qualitySql + "), " +
        "g AS (SELECT d.doc_id, d.source, d.text, " +
        "(('0x'||substr(md5('cap:'||d.doc_id), 1, 16))::UBIGINT & 16383) AS pri " +
        "FROM documents d JOIN q ON d.doc_id = q.doc_id WHERE q.quality >= 0.5), " +
        "c AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rn FROM g), " +
        "sh AS (SELECT doc_id, text, " +
        "(('0x'||substr(md5('ep0:'||doc_id), 1, 16))::UBIGINT & 16383) % 8 AS shard " +
        "FROM c WHERE rn <= 15) " +
        "SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs, " +
        "CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens " +
        "FROM sh GROUP BY 1"),
    // full-vocabulary tf-idf keywords: tf and df CTEs, idf = ln((N+1)/(df+1))
    "text_keywords" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2), " +
        "dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
        "n AS (SELECT count(*) AS n_docs FROM documents), " +
        "sc AS (SELECT tf.doc_id, tf.term, tf.tf, " +
        "round(tf.tf * ln((n.n_docs + 1.0) / (dft.df + 1.0)), 6) AS tfidf " +
        "FROM tf JOIN dft USING (term) CROSS JOIN n), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY tfidf DESC, term) AS rn FROM sc) " +
        "SELECT doc_id, term, tf, tfidf FROM r WHERE rn <= 3"),
    // the composed training-data pipeline: quality + language gates,
    // near-dup removal, per-source rollup
    "pipeline_filter" ->
      ("SELECT d.source, count(*) AS n_docs, round(avg(q.quality), 4) AS avg_quality " +
        "FROM documents d " +
        "JOIN (" + qualitySql + ") q ON d.doc_id = q.doc_id " +
        "JOIN (" + langidSql + ") l ON d.doc_id = l.doc_id " +
        "WHERE q.quality >= 0.5 AND l.pred_lang = 'en' " +
        "AND d.doc_id NOT IN (SELECT doc_id FROM " + droppedSql + " dr) " +
        "GROUP BY d.source"),
    "text_tokens" ->
      ("SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens, " +
        "len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens, " +
        "length(text) AS n_chars FROM documents"),
    "multimodal_meta" ->
      ("SELECT doc_id, 'text/plain' AS mime, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents"),
    "text_fingerprint" ->
      ("WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents), " +
        "fp AS (SELECT doc_id, list_reduce(list_prepend(0::BIGINT, " +
        "[((" + wrapSigned(md5u("t")) + " % 2147483647) + 2147483647) % 2147483647 for t in w]), " +
        "(a, b) -> (a * 131 + b) % 2147483647) AS fingerprint FROM tok), " +
        "h AS (SELECT doc_id, " + md5u("t") + " AS u FROM " +
        "(SELECT doc_id, unnest(w) AS t FROM tok)), " +
        "bits AS (SELECT doc_id, i, sum(CASE WHEN (u >> i) & 1 = 1 THEN 1 ELSE -1 END) AS c " +
        "FROM h, generate_series(0, 63) g(i) GROUP BY doc_id, i), " +
        "sk AS (SELECT doc_id, sum(CASE WHEN c > 0 THEN (1::UBIGINT << i) " +
        "ELSE 0::UBIGINT END)::UBIGINT AS u FROM bits GROUP BY doc_id) " +
        "SELECT f.doc_id, f.fingerprint, " + wrapSigned("s.u") + " AS simhash " +
        "FROM fp f JOIN sk s ON f.doc_id = s.doc_id"),
    "text_winnow" ->
      (winnowCte + "SELECT doc_id, count(*) AS n_fps, min(fp) AS min_fp " +
        "FROM fp GROUP BY doc_id"),
    // same closed-form least squares over round6'd (ln rank, ln freq)
    // terms; round4 on the fitted coefficients
    "text_zipf" ->
      ("WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents), " +
        "f AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok), " +
        "r AS (SELECT row_number() OVER (ORDER BY c DESC, tok) AS rank, c FROM f " +
        "ORDER BY c DESC, tok LIMIT 100), " +
        "p AS (SELECT round(ln(rank), 6) AS x, round(ln(c), 6) AS y FROM r), " +
        "s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, " +
        "sum(round(x * y, 6)) AS sxy, sum(round(x * x, 6)) AS sxx FROM p) " +
        "SELECT CAST(n AS BIGINT) AS n_ranks, " +
        "round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope, " +
        "round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4) AS intercept " +
        "FROM s"),
    "dedup_winnow" ->
      (winnowCte + "SELECT a.doc_id AS a_id, b.doc_id AS b_id, " +
        "count(*) AS shared FROM fp a JOIN fp b " +
        "ON a.fp = b.fp AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2 HAVING count(*) >= 2"),
    // phash replayed exactly: 64 block sums over the byte list, bit i by
    // the same cross-multiplied mean compare, OR-folded into a UBIGINT
    "multimodal_phash" ->
      ("WITH b AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n, " +
        "[ord(substr(text, p, 1)) for p in generate_series(1, length(text))] AS bs " +
        "FROM documents), " +
        "t AS (SELECT doc_id, n, bs, coalesce(list_sum(bs), 0) AS total FROM b), " +
        "ph AS (SELECT doc_id, " + wrapSigned(
          "list_reduce([CASE WHEN coalesce(list_sum(bs[((i*n)//64)+1:((i+1)*n)//64]), 0) * n " +
          "> total * (((i+1)*n)//64 - (i*n)//64) THEN (1::UBIGINT << i) " +
          "ELSE 0::UBIGINT END for i in generate_series(0, 63)], (x, y) -> x | y)") +
        " AS ph FROM t) " +
        "SELECT doc_id, ph FROM ph"),
    "multimodal_decode" ->
      ("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes, " +
        "CAST(list_sum([ord(substr(text, i, 1)) for i in generate_series(1, length(text))]) " +
        "AS BIGINT) AS sum_bytes, " +
        "CAST(list_max([ord(substr(text, i, 1)) for i in generate_series(1, length(text))]) " +
        "AS BIGINT) AS max_byte, " +
        "CAST(" + crcSql("substr(text, 1, 16)") + " & 16383 AS BIGINT) AS head_crc_slot " +
        "FROM documents"),
    // truth columns are closed-form over (doc_id, w, h): the engine
    // decodes real PNG bytes, the oracle never needs a codec
    "multimodal_imageio" ->
      ("WITH d AS (SELECT doc_id, doc_id % 8 + 1 AS w, doc_id % 5 + 1 AS h " +
        "FROM documents WHERE doc_id % 10 = 0), " +
        "px AS (SELECT doc_id, w, h, (doc_id * 31 + x * 7 + y * 13) % 256 AS v " +
        "FROM d, UNNEST(generate_series(0, w - 1)) AS gx(x), " +
        "UNNEST(generate_series(0, h - 1)) AS gy(y)) " +
        "SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, " +
        "CAST(w * h AS BIGINT) AS n_pixels, CAST(sum(v) AS BIGINT) AS px_sum " +
        "FROM px GROUP BY 1, 2, 3, 4"),
    // all 64 block-mean bits rebuilt from closed-form pixels; integer
    // compare s_b*N > total*n_b, disjoint bits summed = OR'd
    "multimodal_image_phash" ->
      ("WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0), " +
        "px AS (SELECT doc_id, x, y, (doc_id * 31 + x * 7 + y * 13) % 256 AS v " +
        "FROM d, UNNEST(generate_series(0, 23)) AS gx(x), " +
        "UNNEST(generate_series(0, 15)) AS gy(y)), " +
        "b AS (SELECT doc_id, ((y * 8) // 16) * 8 + ((x * 8) // 24) AS blk, " +
        "sum(v) AS s, count(*) AS n FROM px GROUP BY 1, 2), " +
        "t AS (SELECT doc_id, sum(s) AS total, sum(n) AS np FROM b GROUP BY 1) " +
        "SELECT b.doc_id, " + wrapSigned(
          "sum(CASE WHEN s * np > total * n THEN ((1::UBIGINT << blk)::HUGEINT) " +
          "ELSE 0::HUGEINT END)") + " AS ph " +
        "FROM b JOIN t ON b.doc_id = t.doc_id GROUP BY 1"),
    // resized truth: dims halve (ceil), pixel (x, y) = source (2x, 2y)
    "multimodal_resize_real" ->
      ("WITH d AS (SELECT doc_id, (doc_id % 8 + 1 + 1) // 2 AS w2, " +
        "(doc_id % 5 + 1 + 1) // 2 AS h2 " +
        "FROM documents WHERE doc_id % 10 = 0), " +
        "px AS (SELECT doc_id, w2, h2, " +
        "(doc_id * 31 + (2 * x) * 7 + (2 * y) * 13) % 256 AS v " +
        "FROM d, UNNEST(generate_series(0, w2 - 1)) AS gx(x), " +
        "UNNEST(generate_series(0, h2 - 1)) AS gy(y)) " +
        "SELECT doc_id, CAST(w2 AS BIGINT) AS width, CAST(h2 AS BIGINT) AS height, " +
        "CAST(w2 * h2 AS BIGINT) AS n_pixels, CAST(sum(v) AS BIGINT) AS px_sum " +
        "FROM px GROUP BY 1, 2, 3, 4"),
    "multimodal_embed" ->
      ("WITH e AS (SELECT doc_id, [(coalesce(list_sum(" +
        "[ord(substr(text, p, 1)) for p in generate_series(1, length(text)) " +
        "if (p - 1) % 8 = j]), 0))::DOUBLE for j in generate_series(0, 7)] AS v " +
        "FROM documents) " +
        "SELECT query_id, rank, neighbor_id, cos FROM (" +
        "SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id, " +
        "round(list_cosine_similarity(q.v, c.v), 4) AS cos, " +
        "CAST(row_number() OVER (PARTITION BY q.doc_id " +
        "ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.doc_id) AS BIGINT) AS rank " +
        "FROM e q JOIN e c ON q.doc_id != c.doc_id WHERE q.doc_id < 10) WHERE rank <= 3"),
    "multimodal_resize" ->
      ("SELECT doc_id, CAST(length(ds) AS BIGINT) AS n_bytes, md5(ds) AS payload_md5 FROM (" +
        "SELECT doc_id, array_to_string([substr(text, p, 1) " +
        "for p in generate_series(1, length(text)) if (p - 1) % 2 = 0], '') AS ds " +
        "FROM documents)"),
    "multimodal_frames" ->
      ("SELECT doc_id, frame_idx, md5(frame) AS frame_md5 FROM (" +
        "SELECT doc_id, i AS frame_idx, substr(text, CAST(i * 256 + 1 AS BIGINT), 64) AS frame " +
        "FROM documents, UNNEST(generate_series(0, CAST(floor(length(text) / 256.0) AS BIGINT))) " +
        "t(i)) WHERE length(frame) > 0"),
    "q_crc16_slots" ->
      ("SELECT CAST(slot % 32 AS BIGINT) AS bucket, count(*) AS n FROM (" +
        "SELECT " + crcSql("k") + " & 16383 AS slot FROM " +
        "(SELECT concat('cust:', c_custkey) AS k FROM customer)) GROUP BY bucket"),
    "q_approx_distinct" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts, " +
        "TRUE AS approx_ok FROM lineitem GROUP BY l_returnflag"),
    // two-level sketch rollup: estimate must sit within the 5% band
    "q_hll_union" ->
      ("SELECT r_name, count(DISTINCT c_custkey) AS exact, TRUE AS union_ok " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"),
    // every profile value replayed bit-identically: same string forms,
    // same md5 bottom-256 hash sets, est = 255·2^63/h_(256)
    "q_profile" ->
      ("WITH m AS (" +
        "SELECT 'o_orderkey' AS col_name, o_orderkey::VARCHAR AS v FROM orders " +
        "UNION ALL SELECT 'o_custkey', o_custkey::VARCHAR FROM orders " +
        "UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders " +
        "UNION ALL SELECT 'o_totalprice', o_totalprice::DECIMAL(12,2)::VARCHAR FROM orders " +
        "UNION ALL SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d') FROM orders " +
        "UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders), " +
        "s AS (SELECT col_name, count(*) AS n_rows, " +
        "count(*) FILTER (WHERE v IS NULL) AS n_null, " +
        "min(v) AS min_v, max(v) AS max_v FROM m GROUP BY col_name), " +
        "hs AS (SELECT DISTINCT col_name, CAST((" + md5u("'kmv:'||col_name||':'||v") +
        " & 9223372036854775807::UBIGINT) AS BIGINT) AS h FROM m WHERE v IS NOT NULL), " +
        "bk AS (SELECT col_name, h, row_number() OVER " +
        "(PARTITION BY col_name ORDER BY h) AS rn FROM hs), " +
        "e AS (SELECT col_name, count(*) AS m_used, max(h) AS kth " +
        "FROM bk WHERE rn <= 256 GROUP BY col_name) " +
        "SELECT s.col_name, s.n_rows, s.n_null, s.min_v, s.max_v, e.m_used, " +
        "round(CASE WHEN e.m_used < 256 THEN e.m_used::DOUBLE " +
        "ELSE 255.0 * 9223372036854775808.0 / e.kth END, 2) AS distinct_est " +
        "FROM s JOIN e USING (col_name)"),
    // KMV set algebra replayed exactly: per-source bottom-256 md5 hash
    // sets, union sketch = bottom-256 of the merged sets, jaccard =
    // |L∩A∩B|/|L|, intersection = jaccard·union_est — no tolerance band
    "q_kmv_ops" ->
      ("WITH tok AS (SELECT source, string_split(lower(text), ' ') AS w FROM documents), " +
        "g AS (SELECT DISTINCT source, array_to_string(w[i:i+4], ' ') AS g " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
        "hs AS (SELECT DISTINCT source, CAST((" + md5u("'kmv:'||g") +
        " & 9223372036854775807::UBIGINT) AS BIGINT) AS h FROM g), " +
        "ex AS (SELECT source, count(*) AS n FROM g GROUP BY source), " +
        "bk AS (SELECT source, h, row_number() OVER " +
        "(PARTITION BY source ORDER BY h) AS rn FROM hs), " +
        "bks AS (SELECT source, h FROM bk WHERE rn <= 256), " +
        "xi AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS exact_inter " +
        "FROM g a JOIN g b ON a.g = b.g AND a.source < b.source GROUP BY 1, 2), " +
        "pr AS (SELECT a.source AS source_a, b.source AS source_b, a.n AS na, b.n AS nb " +
        "FROM ex a JOIN ex b ON a.source < b.source), " +
        "uh AS (SELECT DISTINCT p.source_a, p.source_b, k.h " +
        "FROM pr p JOIN bks k ON k.source IN (p.source_a, p.source_b)), " +
        "mk AS (SELECT source_a, source_b, h, row_number() OVER " +
        "(PARTITION BY source_a, source_b ORDER BY h) AS rn FROM uh), " +
        "mks AS (SELECT source_a, source_b, h FROM mk WHERE rn <= 256), " +
        "mag AS (SELECT source_a, source_b, count(*) AS m, max(h) AS kth " +
        "FROM mks GROUP BY 1, 2), " +
        "ib AS (SELECT m.source_a, m.source_b, count(*) AS inboth " +
        "FROM mks m JOIN bks ka ON ka.source = m.source_a AND ka.h = m.h " +
        "JOIN bks kb ON kb.source = m.source_b AND kb.h = m.h GROUP BY 1, 2) " +
        "SELECT p.source_a, p.source_b, " +
        "p.na + p.nb - coalesce(x.exact_inter, 0) AS exact_union, " +
        "coalesce(x.exact_inter, 0) AS exact_inter, " +
        "round(CASE WHEN q.m < 256 THEN q.m::DOUBLE " +
        "ELSE 255.0 * 9223372036854775808.0 / q.kth END, 2) AS union_est, " +
        "round((coalesce(ib.inboth, 0)::DOUBLE / q.m) * " +
        "CASE WHEN q.m < 256 THEN q.m::DOUBLE " +
        "ELSE 255.0 * 9223372036854775808.0 / q.kth END, 2) AS inter_est, " +
        "round(coalesce(ib.inboth, 0)::DOUBLE / q.m, 6) AS jaccard_est " +
        "FROM pr p JOIN mag q USING (source_a, source_b) " +
        "LEFT JOIN xi x USING (source_a, source_b) " +
        "LEFT JOIN ib USING (source_a, source_b)"),
    // per-event-type KMV distinct-user estimates replayed exactly from
    // the same md5 bottom-256 hash sets (batch twin of the streaming
    // mergeable sketch)
    "stream_kmv" ->
      ("WITH v AS (SELECT DISTINCT event_type, user_id::VARCHAR AS v FROM events), " +
        "hs AS (SELECT DISTINCT event_type, CAST((" + md5u("'kmv:'||v") +
        " & 9223372036854775807::UBIGINT) AS BIGINT) AS h FROM v), " +
        "bk AS (SELECT event_type, h, row_number() OVER " +
        "(PARTITION BY event_type ORDER BY h) AS rn FROM hs), " +
        "e AS (SELECT event_type, count(*) AS m_used, max(h) AS kth " +
        "FROM bk WHERE rn <= 256 GROUP BY event_type), " +
        "ex AS (SELECT event_type, count(*) AS n_exact FROM v GROUP BY event_type) " +
        "SELECT ex.event_type, ex.n_exact, e.m_used, " +
        "round(CASE WHEN e.m_used < 256 THEN e.m_used::DOUBLE " +
        "ELSE 255.0 * 9223372036854775808.0 / e.kth END, 2) AS distinct_est " +
        "FROM ex JOIN e USING (event_type)"),
    // the md5 bottom-512 sample and the type-1 quantile indexes replay
    // exactly — outputs are raw data values, no interpolation
    "q_sketch_quantiles" ->
      ("WITH h AS (SELECT o_orderstatus, o_totalprice, o_orderkey, " +
        wrapSigned(md5u("'qs:'||o_orderkey")) + " AS qh FROM orders), " +
        "r AS (SELECT o_orderstatus, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_orderstatus ORDER BY qh, o_orderkey) AS rn FROM h), " +
        "s AS (SELECT o_orderstatus, list(o_totalprice ORDER BY o_totalprice) AS vs, " +
        "count(*) AS n_sampled FROM r WHERE rn <= 512 GROUP BY o_orderstatus) " +
        "SELECT o_orderstatus, n_sampled, " +
        "vs[CAST(ceil(0.5 * n_sampled) AS INT)] AS p50, " +
        "vs[CAST(ceil(0.9 * n_sampled) AS INT)] AS p90, " +
        "vs[CAST(ceil(0.99 * n_sampled) AS INT)] AS p99 FROM s"),
    "q_percentile_approx" ->
      ("SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 2) AS median, " +
        "TRUE AS approx_ok FROM orders GROUP BY o_orderstatus"),
    "q_explode_tokens" ->
      ("SELECT tok, count(*) AS n FROM " +
        "(SELECT unnest(string_split(p_name, ' ')) AS tok FROM part) " +
        "GROUP BY tok HAVING count(*) > 1"),
    "q_ntile_cume" ->
      ("SELECT o_orderpriority, o_orderkey, decile, pr, cd FROM (" +
        "SELECT o_orderpriority, o_orderkey, CAST(ntile(10) OVER w AS BIGINT) AS decile, " +
        "round(percent_rank() OVER w, 6) AS pr, round(cume_dist() OVER w, 6) AS cd " +
        "FROM orders WINDOW w AS (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice, o_orderkey)) WHERE decile = 10"),
    "q_minmax_by" ->
      ("SELECT user_id, arg_min(event_type, event_id) AS first_type, " +
        "arg_max(event_type, event_id) AS last_type, min(event_id) AS first_event, " +
        "max(event_id) AS last_event FROM events GROUP BY user_id"),
    "q_regexp_extract" ->
      ("SELECT regexp_extract(o_orderpriority, '^(\\d)-', 1) AS prio_num, " +
        "regexp_extract(o_orderpriority, '-(.+)$', 1) AS prio_word, count(*) AS n " +
        "FROM orders GROUP BY prio_num, prio_word"),
    "q_array_lambda" ->
      ("SELECT p_partkey, CAST(p_size AS BIGINT) AS sz, " +
        "CAST(list_sum([x * x for x in generate_series(1::BIGINT, p_size::BIGINT)]) AS BIGINT) " +
        "AS sum_sq, " +
        "CAST(len(list_filter(generate_series(1::BIGINT, p_size::BIGINT), x -> x % 2 = 0)) " +
        "AS BIGINT) AS n_even FROM part"),
    "q_map_funcs" ->
      ("SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types, " +
        "CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_clicks, " +
        "count(DISTINCT event_type) AS n_types FROM events GROUP BY user_id"),
    "q_window_range" ->
      ("SELECT o_orderpriority, o_orderkey, " +
        "round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate " +
        "RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 2) AS wk_sum FROM orders"),
    "q_point_lookup" ->
      ("SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal " +
        "FROM customer WHERE c_custkey = 42"),
    "q_skew_salted" ->
      ("SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS sum_value " +
        "FROM events JOIN customer ON user_id = c_custkey GROUP BY c_mktsegment"),
    "q_gap_fill" ->
      ("WITH b AS (SELECT date_trunc('month', min(o_orderdate)) AS lo, " +
        "date_trunc('month', max(o_orderdate)) AS hi FROM orders), " +
        "months AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS mon FROM b), " +
        "st AS (SELECT DISTINCT o_orderstatus FROM orders), " +
        "agg AS (SELECT date_trunc('month', o_orderdate) AS mon, o_orderstatus, " +
        "count(*) AS n FROM orders GROUP BY 1, 2) " +
        "SELECT s.o_orderstatus, m.mon, coalesce(a.n, 0) AS n FROM months m " +
        "CROSS JOIN st s LEFT JOIN agg a ON a.mon = m.mon AND a.o_orderstatus = s.o_orderstatus"),
    "q_histogram" ->
      ("SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket, count(*) AS n, " +
        "round(avg(o_totalprice), 2) AS avg_price FROM orders GROUP BY bucket"),
    "q_bitwise_agg" ->
      ("SELECT l_returnflag, CAST(bit_and(l_linenumber) AS BIGINT) AS and_ln, " +
        "CAST(bit_or(l_linenumber) AS BIGINT) AS or_ln, " +
        "CAST(bit_xor(l_orderkey % 256) AS BIGINT) AS xor_ok " +
        "FROM lineitem GROUP BY l_returnflag"),
    "stream_dedup" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    // round-trips re-read what was written, so the oracle is the
    // same aggregate straight off the parquet fixture
    "q_csv_roundtrip" ->
      ("SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS bal " +
        "FROM supplier GROUP BY s_nationkey"),
    "q_json_roundtrip" ->
      ("SELECT year(o_orderdate) AS y, count(*) AS n, " +
        "round(sum(o_totalprice), 2) AS sum_price FROM orders " +
        "WHERE o_orderstatus = 'F' GROUP BY y"),
    "q_partitioned_sink" ->
      ("SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty " +
        "FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_returnflag"),
    "q_jdbc_roundtrip" ->
      ("SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name " +
        "FROM nation GROUP BY n_regionkey"),
    "q_variant" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k " +
        "FROM events GROUP BY event_type"),
    "q_lateral" ->
      ("SELECT c_custkey, n_orders, total_spent FROM customer, LATERAL (" +
        "SELECT count(*) AS n_orders, " +
        "round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent " +
        "FROM orders WHERE o_custkey = c_custkey) t"),
    "q_unpivot" ->
      ("WITH a AS (SELECT l_returnflag, round(sum(l_quantity), 2) AS qty, " +
        "round(sum(l_extendedprice), 2) AS price, round(sum(l_discount), 2) AS disc " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, 'qty' AS metric, qty AS value FROM a " +
        "UNION ALL SELECT l_returnflag, 'price', price FROM a " +
        "UNION ALL SELECT l_returnflag, 'disc', disc FROM a"),
    "q_orc_roundtrip" ->
      ("SELECT p_brand, count(*) AS n, round(sum(p_retailprice), 2) AS price " +
        "FROM part GROUP BY p_brand"),
    // schema drift: gen-1 rows surface the evolved column as NULL
    "q_schema_evolution" ->
      ("WITH g AS (SELECT c_custkey, c_nationkey, " +
        "CASE WHEN c_custkey % 2 <> 0 THEN round(c_acctbal, 2) END AS acctbal " +
        "FROM customer) " +
        "SELECT c_nationkey, count(*) AS n_total, " +
        "count(acctbal) AS n_with_balance, " +
        "round(sum(coalesce(acctbal, 0.0)), 2) AS sum_balance " +
        "FROM g GROUP BY c_nationkey"),
    "q_sorted_sink" ->
      ("SELECT o_orderdate, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price " +
        "FROM orders WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-03-31' " +
        "GROUP BY o_orderdate"),
    // bucketing is a layout property: result ≡ the plain join
    "q_bucketed_join" ->
      ("SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"),
    // segment pruning is a layout/metadata property: result ≡ the
    // plain range filter (pruning only skips segments the range
    // cannot intersect; the predicate still applies)
    "q_segment_pruned" ->
      ("SELECT o_orderdate, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price " +
        "FROM orders WHERE o_orderdate BETWEEN '1996-06-01' AND '1996-06-30' " +
        "GROUP BY o_orderdate"),
    // the automatic (optimizer-rule) pruning path must be invisible
    // in results: same oracle as the explicit-API query
    "q_segment_pruned_auto" ->
      ("SELECT o_orderdate, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price " +
        "FROM orders WHERE o_orderdate BETWEEN '1996-06-01' AND '1996-06-30' " +
        "GROUP BY o_orderdate"),
    // the pre-append version IS the filtered subset: time travel is a
    // retention/layout property, invisible in results
    "q_time_travel" ->
      ("SELECT year(o_orderdate) AS yr, count(*) AS n, " +
        "round(sum(o_totalprice), 2) AS sum_price " +
        "FROM orders WHERE o_orderdate < '1997-01-01' GROUP BY 1"),
    // the feed after the base write's watermark IS the appended rows
    "q_segment_feed" ->
      ("SELECT year(o_orderdate) AS yr, count(*) AS n, " +
        "round(sum(o_totalprice), 2) AS sum_price " +
        "FROM orders WHERE o_orderdate >= '1997-01-01' GROUP BY 1"),
    "dedup_incremental" -> incrementalDedupSql,
    // the persistent-index path verifies candidates with the same
    // exact jaccard, and LSH recall at k=128/bands=32 is ≈1 at the
    // 0.7 threshold — so the exhaustive batch×corpus SQL is its
    // oracle too (exactly as dedup_minhash reuses ngramJaccardSql)
    "dedup_index_incremental" -> incrementalDedupSql,
    // index built on 80% + appended 10% ≡ index built on 90%: the
    // maintained index must answer exactly like a fresh build
    "dedup_index_append" -> incrementalDedupSql,
    // persisted+appended filter bank: same summary as dedup_bloom_gate
    "dedup_bloom_persist" ->
      ("WITH cut AS (SELECT (max(doc_id) + 1) * 9 // 10 AS c FROM documents), " +
        "b AS (SELECT text FROM documents, cut WHERE doc_id >= c), " +
        "ct AS (SELECT DISTINCT text FROM documents, cut WHERE doc_id < c) " +
        "SELECT count(*) AS n_batch, " +
        "count(*) FILTER (b.text IN (SELECT text FROM ct)) AS n_true_dups, " +
        "TRUE AS no_false_negatives, TRUE AS gate_effective FROM b"),
    // bloom pre-filter is transparent: result ≡ the plain join
    "q_bloom_join" ->
      ("SELECT c_nationkey, count(*) AS n, round(sum(value), 2) AS sum_value " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey"),
    // replays the deterministic k-means step (id%32 seeds → mean
    // centroids → argmax-cos assignment) then pairs within clusters
    "dedup_semantic" ->
      ("WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "planted AS (SELECT vec_id + 100000 AS vec_id, " +
        "[CASE WHEN (i - 1) % 2 = 0 THEN v[i] * 1.1 ELSE v[i] * 0.9 END " +
        "for i in generate_series(1, len(v))] AS v FROM base WHERE vec_id < 50), " +
        "c AS (SELECT * FROM base UNION ALL SELECT * FROM planted), " +
        "d AS (SELECT vec_id % 32 AS _b, i, avg(v[i]) AS cv FROM c, " +
        "generate_series(1, 64) t(i) GROUP BY 1, 2), " +
        "cent AS (SELECT _b, list(cv ORDER BY i) AS centroid FROM d GROUP BY _b), " +
        "assign AS (SELECT vec_id, v, _b FROM (" +
        "SELECT x.vec_id, x.v, ct._b, row_number() OVER (PARTITION BY x.vec_id " +
        "ORDER BY list_cosine_similarity(x.v, ct.centroid) DESC, ct._b) AS rn " +
        "FROM c x, cent ct) WHERE rn = 1) " +
        "SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "round(list_cosine_similarity(a.v, b.v), 4) AS cos " +
        "FROM assign a JOIN assign b ON a._b = b._b AND a.vec_id < b.vec_id " +
        "WHERE list_cosine_similarity(a.v, b.v) >= 0.95"),
    "dedup_spans" ->
      ("WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+19], ' ') AS s " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 19, 0))) AS t(i)), " +
        "hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 2) " +
        "SELECT doc_id, count(*) AS n_shared_spans FROM sh JOIN hot USING (s) " +
        "GROUP BY doc_id"),
    // full span-rewrite replay: positioned 20-token windows,
    // keep-first by (doc_id, pos) row_number, interval coverage of
    // duplicate starts, ordered reassembly of surviving tokens
    "dedup_span_rewrite" -> spanRewriteSql(""),
    // the maintained path: identical global replay (corpus ∪ batch),
    // output restricted to the batch docs
    "dedup_span_rewrite_incr" -> spanRewriteSql(
      " WHERE tok.doc_id >= (SELECT (max(doc_id) + 1) * 9 // 10 FROM documents)"),
    // DELETE-mask replay: batch window dup iff its hash's corpus-first
    // owner survives the takedown, else iff an earlier batch
    // occurrence exists (the one-owner-per-hash revive semantic)
    "dedup_span_rewrite_del" ->
      ("WITH cut AS (SELECT (max(doc_id) + 1) * 9 // 10 AS c FROM documents), " +
        "tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "pos AS (SELECT doc_id, i - 1 AS p, array_to_string(w[i:i+19], ' ') AS sh " +
        "FROM tok, UNNEST(generate_series(1, len(w) - 19)) t(i) WHERE len(w) >= 20), " +
        "fc AS (SELECT sh, odoc FROM (SELECT pos.sh, pos.doc_id AS odoc, " +
        "row_number() OVER (PARTITION BY pos.sh ORDER BY pos.doc_id, pos.p) AS rn " +
        "FROM pos, cut WHERE pos.doc_id < cut.c) WHERE rn = 1), " +
        "vo AS (SELECT sh FROM fc WHERE odoc % 7 != 1), " +
        "bpos AS (SELECT pos.doc_id, pos.p, pos.sh FROM pos, cut " +
        "WHERE pos.doc_id >= cut.c), " +
        "bf AS (SELECT sh, bdoc, bp FROM (SELECT sh, doc_id AS bdoc, p AS bp, " +
        "row_number() OVER (PARTITION BY sh ORDER BY doc_id, p) AS rn FROM bpos) " +
        "WHERE rn = 1), " +
        "dup AS (SELECT b.doc_id, b.p FROM bpos b " +
        "LEFT JOIN vo ON b.sh = vo.sh JOIN bf ON b.sh = bf.sh " +
        "WHERE vo.sh IS NOT NULL OR NOT (b.doc_id = bf.bdoc AND b.p = bf.bp)), " +
        "cov AS (SELECT DISTINCT doc_id, tp FROM dup, " +
        "UNNEST(generate_series(p, p + 19)) c(tp)), " +
        "tkn AS (SELECT tok.doc_id, i - 1 AS tp, w[i] AS tokn FROM tok, cut, " +
        "UNNEST(generate_series(1, len(w))) t(i) WHERE tok.doc_id >= cut.c), " +
        "kept AS (SELECT tkn.doc_id, tkn.tp, tkn.tokn FROM tkn " +
        "LEFT JOIN cov ON tkn.doc_id = cov.doc_id AND tkn.tp = cov.tp " +
        "WHERE cov.tp IS NULL), " +
        "agg AS (SELECT doc_id, count(*) AS n_after, " +
        "string_agg(tokn, ' ' ORDER BY tp) AS txt FROM kept GROUP BY doc_id) " +
        "SELECT tok.doc_id, CAST(len(tok.w) AS BIGINT) AS n_before, " +
        "CAST(coalesce(agg.n_after, 0) AS BIGINT) AS n_after, " +
        "md5(coalesce(agg.txt, '')) AS rewritten_md5 " +
        "FROM tok CROSS JOIN cut LEFT JOIN agg ON tok.doc_id = agg.doc_id " +
        "WHERE tok.doc_id >= cut.c"),
    // replays the two-pass BM25 arithmetic term-by-term in the same
    // order (idf and avgdl rounded to 6 decimals before scoring on
    // both sides, so the unrounded ranking doubles are bit-identical)
    "retrieval_metrics" ->
      ("WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents), q AS (SELECT 'hash' AS query, doc_id, CAST(len(list_filter(w, x -> x = 'hash')) AS DOUBLE) AS rel, CAST(len(list_filter(w, x -> x = 'hash')) AS DOUBLE) / len(w) AS score FROM tok UNION ALL SELECT 'merge' AS query, doc_id, CAST(len(list_filter(w, x -> x = 'merge')) AS DOUBLE) AS rel, CAST(len(list_filter(w, x -> x = 'merge')) AS DOUBLE) / len(w) AS score FROM tok UNION ALL SELECT 'join' AS query, doc_id, CAST(len(list_filter(w, x -> x = 'join')) AS DOUBLE) AS rel, CAST(len(list_filter(w, x -> x = 'join')) AS DOUBLE) / len(w) AS score FROM tok), pos AS (SELECT * FROM q WHERE rel > 0), rk AS (SELECT query, doc_id, row_number() OVER (PARTITION BY query ORDER BY score DESC, doc_id) AS rank FROM pos), hits AS (SELECT rk.query, rk.rank FROM rk JOIN pos p ON rk.query = p.query AND rk.doc_id = p.doc_id WHERE rk.rank <= 10), pq AS (SELECT query, round(1.0 / min(rank), 6) AS rr, count(*) AS n_hit FROM hits GROUP BY query), tot AS (SELECT query, count(*) AS n_rel FROM pos GROUP BY query) SELECT t.query, coalesce(pq.rr, 0.0) AS rr, round(coalesce(pq.n_hit, 0) * 1.0 / t.n_rel, 6) AS recall FROM tot t LEFT JOIN pq ON t.query = pq.query"),
    "retrieval_ndcg" ->
      ("WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents), q AS (SELECT 'hash' AS query, doc_id, CAST(len(list_filter(w, x -> x = 'hash')) AS DOUBLE) AS rel, CAST(len(list_filter(w, x -> x = 'hash')) AS DOUBLE) / len(w) AS score FROM tok UNION ALL SELECT 'merge' AS query, doc_id, CAST(len(list_filter(w, x -> x = 'merge')) AS DOUBLE) AS rel, CAST(len(list_filter(w, x -> x = 'merge')) AS DOUBLE) / len(w) AS score FROM tok UNION ALL SELECT 'join' AS query, doc_id, CAST(len(list_filter(w, x -> x = 'join')) AS DOUBLE) AS rel, CAST(len(list_filter(w, x -> x = 'join')) AS DOUBLE) / len(w) AS score FROM tok), pos AS (SELECT * FROM q WHERE rel > 0), rk AS (SELECT query, doc_id, rel, row_number() OVER (PARTITION BY query ORDER BY score DESC, doc_id) AS rank FROM pos), dcg AS (SELECT query, sum(rel / log2(rank + 1)) AS dcg FROM rk WHERE rank <= 10 GROUP BY query), irk AS (SELECT query, rel, row_number() OVER (PARTITION BY query ORDER BY rel DESC, doc_id) AS irank FROM pos), idcg AS (SELECT query, sum(rel / log2(irank + 1)) AS idcg FROM irk WHERE irank <= 10 GROUP BY query), uq AS (SELECT DISTINCT query FROM pos) SELECT u.query, CASE WHEN coalesce(i.idcg, 0.0) = 0.0 THEN 0.0 ELSE round(coalesce(d.dcg, 0.0) / i.idcg, 6) END AS ndcg FROM uq u LEFT JOIN dcg d ON u.query = d.query LEFT JOIN idcg i ON u.query = i.query"),
    "text_bm25" ->
      ("WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents), " +
        "st AS (SELECT count(*) AS n_docs, round(avg(len(w)), 6) AS avgdl, " +
        "sum(CASE WHEN list_contains(w, 'hash') THEN 1 ELSE 0 END) AS df0, " +
        "sum(CASE WHEN list_contains(w, 'merge') THEN 1 ELSE 0 END) AS df1, " +
        "sum(CASE WHEN list_contains(w, 'join') THEN 1 ELSE 0 END) AS df2 FROM tok), " +
        "idf AS (SELECT avgdl, " +
        "round(ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1), 6) AS i0, " +
        "round(ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1), 6) AS i1, " +
        "round(ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1), 6) AS i2 FROM st), " +
        "sc AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, " +
        bm25Term("i0", "hash") + " + " + bm25Term("i1", "merge") + " + " +
        bm25Term("i2", "join") + " AS s FROM tok, idf) " +
        "SELECT doc_id, n_tokens, round(s, 4) AS bm25 FROM sc " +
        "ORDER BY s DESC, doc_id LIMIT 50"),
    // hybrid fusion: the bm25 top-50 (replayed term-by-term) and the
    // exact cosine top-50 for query vector 0, fused by 1/(60+rank)
    "retrieval_rrf" ->
      ("WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents), " +
        "st AS (SELECT count(*) AS n_docs, round(avg(len(w)), 6) AS avgdl, " +
        "sum(CASE WHEN list_contains(w, 'hash') THEN 1 ELSE 0 END) AS df0, " +
        "sum(CASE WHEN list_contains(w, 'merge') THEN 1 ELSE 0 END) AS df1, " +
        "sum(CASE WHEN list_contains(w, 'join') THEN 1 ELSE 0 END) AS df2 FROM tok), " +
        "idf AS (SELECT avgdl, " +
        "round(ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1), 6) AS i0, " +
        "round(ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1), 6) AS i1, " +
        "round(ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1), 6) AS i2 FROM st), " +
        "sc AS (SELECT doc_id, " +
        bm25Term("i0", "hash") + " + " + bm25Term("i1", "merge") + " + " +
        bm25Term("i2", "join") + " AS s FROM tok, idf), " +
        "lex50 AS (SELECT doc_id, round(s, 4) AS bm25 FROM sc " +
        "ORDER BY s DESC, doc_id LIMIT 50), " +
        "lexr AS (SELECT doc_id AS id, CAST(row_number() OVER " +
        "(ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank FROM lex50), " +
        "semr AS (SELECT neighbor_id AS id, rank FROM (" +
        "SELECT c.vec_id AS neighbor_id, CAST(row_number() OVER " +
        "(ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, " +
        "c.vec_id) AS BIGINT) AS rank " +
        "FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id " +
        "WHERE q.vec_id = 0) WHERE rank <= 50), " +
        "f AS (SELECT coalesce(l.id, s2.id) AS id, " +
        "coalesce(1.0 / (60 + l.rank), 0) + coalesce(1.0 / (60 + s2.rank), 0) AS rrf " +
        "FROM lexr l FULL JOIN semr s2 ON l.id = s2.id) " +
        "SELECT id, round(rrf, 6) AS rrf FROM f ORDER BY rrf DESC, id LIMIT 20"),
    "text_bpe_pairs" ->
      ("WITH tok AS (SELECT string_split(lower(text), ' ') AS w FROM documents), " +
        "pr AS (SELECT array_to_string(w[i:i+1], ' ') AS pair FROM tok, " +
        "UNNEST(generate_series(1, greatest(len(w) - 1, 0))) t(i)) " +
        "SELECT pair, count(*) AS cnt FROM pr GROUP BY pair " +
        "ORDER BY cnt DESC, pair LIMIT 20"),
    // replays greedy BPE application: each token is wrapped in its own
    // spaces ('␠a␠␠b␠'), each rank's merge is one left-to-right
    // non-overlapping replace of '␠x␠␠y␠' with '␠x<U+0001>y␠' — the
    // single-space unit joiner keeps merged units atomic to later
    // merges, exactly the engine's unit-array semantics
    "text_bpe_apply" ->
      ("WITH RECURSIVE tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w " +
        "FROM documents), " +
        "pr AS (SELECT array_to_string(w[i:i+1], ' ') AS pair FROM tok, " +
        "UNNEST(generate_series(1, greatest(len(w) - 1, 0))) t(i)), " +
        "m0 AS (SELECT pair, count(*) AS cnt FROM pr GROUP BY pair " +
        "ORDER BY cnt DESC, pair LIMIT 20), " +
        "m AS (SELECT row_number() OVER (ORDER BY cnt DESC, pair) AS rk, " +
        "split_part(pair, ' ', 1) AS x, split_part(pair, ' ', 2) AS y FROM m0), " +
        "app AS (" +
        "SELECT doc_id, ' ' || array_to_string(w, '  ') || ' ' AS s, 0 AS step FROM tok " +
        "UNION ALL " +
        "SELECT a.doc_id, replace(a.s, ' ' || m.x || '  ' || m.y || ' ', " +
        "' ' || m.x || chr(1) || m.y || ' '), a.step + 1 " +
        "FROM app a JOIN m ON m.rk = a.step + 1), " +
        "fin AS (SELECT doc_id, string_split(trim(s), '  ') AS units FROM app " +
        "WHERE step = (SELECT max(rk) FROM m)) " +
        "SELECT f.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens, " +
        "CAST(len(f.units) AS BIGINT) AS n_units, " +
        "replace(array_to_string(f.units, '|'), chr(1), ' ') AS seg " +
        "FROM fin f JOIN tok t ON f.doc_id = t.doc_id"),
    "text_bpe_iterative" -> bpeIterativeSql(8),
    // the batched trainer's oracle IS the sequential replay, deeper:
    // a hash match here proves batched ≡ sequential on the real corpus
    "text_bpe_batched" -> bpeIterativeSql(16),
    // learned-merge apply: s8 of the shared chain IS the segmentation
    "text_bpe_table" ->
      (bpeChainSql(8) +
        " SELECT d.doc_id, CAST(len(string_split(lower(d.text), ' ')) AS BIGINT) AS n_tokens, " +
        "CAST(len(string_split(trim(s8.s), '  ')) AS BIGINT) AS n_units, " +
        "replace(array_to_string(string_split(trim(s8.s), '  '), '|'), chr(1), ' ') AS seg " +
        "FROM documents d JOIN s8 ON d.doc_id = s8.doc_id"),
    // the composed ingest decision: exact > near > quality > accepted,
    // each branch the same replay as its standalone oracle
    "pipeline_ingest" ->
      ("WITH cut AS (SELECT (max(doc_id) + 1) * 9 // 10 AS c FROM documents), " +
        "b AS (SELECT doc_id, text FROM documents, cut WHERE doc_id >= c), " +
        "ct AS (SELECT DISTINCT text FROM documents, cut WHERE doc_id < c), " +
        "tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) t(i)), " +
        "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
        "pr AS (SELECT a.doc_id AS new_id, b2.doc_id AS corpus_id, count(*) AS inter " +
        "FROM sh a JOIN sh b2 ON a.shingle = b2.shingle, cut " +
        "WHERE a.doc_id >= cut.c AND b2.doc_id < cut.c GROUP BY 1, 2), " +
        "near AS (SELECT DISTINCT new_id FROM pr " +
        "JOIN sizes sa ON new_id = sa.doc_id JOIN sizes sb ON corpus_id = sb.doc_id " +
        "WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7), " +
        "q AS (SELECT doc_id, " +
        "round(least(len(string_split(lower(text), ' ')) / 64.0, 1.0) * 0.4 " +
        "+ least(round(len(list_filter(string_split(lower(text), ' '), x -> x IN " +
        stopwordsSql + ")) * 1.0 / len(string_split(lower(text), ' ')), 4) * 5.0, 1.0) * 0.2 " +
        "+ round(len(list_distinct(string_split(lower(text), ' '))) * 1.0 / " +
        "len(string_split(lower(text), ' ')), 4) * 0.4, 6) AS quality FROM b) " +
        "SELECT b.doc_id, CASE WHEN b.text IN (SELECT text FROM ct) THEN 'dup_exact' " +
        "WHEN b.doc_id IN (SELECT new_id FROM near) THEN 'near_dup' " +
        "WHEN q.quality < 0.5 THEN 'low_quality' ELSE 'accepted' END AS verdict, " +
        "q.quality FROM b JOIN q USING (doc_id)"),
    "stream_enrich" ->
      ("SELECT c.c_mktsegment AS segment, count(*) AS n_events, " +
        "round(sum(e.value), 2) AS sum_value FROM events e " +
        "JOIN customer c ON e.user_id = c.c_custkey GROUP BY segment"),
    "stream_funnel" ->
      ("SELECT v.user_id, count(*) AS n_funnels, " +
        "round(avg((epoch_ms(p.ts) - epoch_ms(v.ts)) / 1000.0), 4) AS avg_total_s " +
        "FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v " +
        "JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c " +
        "ON v.user_id = c.user_id " +
        "AND epoch_us(c.ts) - epoch_us(v.ts) BETWEEN 1 AND 21600000000 " +
        "JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p " +
        "ON c.user_id = p.user_id " +
        "AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 1 AND 21600000000 " +
        "GROUP BY v.user_id"),
    "q_heavy_hitters" ->
      ("WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents), " +
        "tot AS (SELECT count(*) AS n FROM tok) " +
        "SELECT tok, cnt FROM (SELECT tok, count(*) AS cnt, max(n) AS mn " +
        "FROM tok, tot GROUP BY tok) WHERE cnt >= ceil(0.03 * mn)"),
    // the streaming CMS's batch twin — same cell replay as q_cms_topk
    // on the events stream's user ids
    "stream_cms" ->
      ("WITH tok AS (SELECT user_id::VARCHAR AS k FROM events), " +
        "ex AS (SELECT k, count(*) AS exact FROM tok GROUP BY k " +
        "ORDER BY exact DESC, k LIMIT 10), " +
        "sk AS (SELECT j, CAST((" + md5u("j::VARCHAR||':'||k") +
        " & 8191::UBIGINT) AS BIGINT) AS b, count(*) AS c " +
        "FROM tok, generate_series(0, 3) g(j) GROUP BY 1, 2) " +
        "SELECT CAST(e.k AS BIGINT) AS user_id, e.exact, min(sk.c) AS est " +
        "FROM ex e CROSS JOIN generate_series(0, 3) g(j) " +
        "JOIN sk ON sk.j = g.j AND sk.b = CAST((" +
        md5u("g.j::VARCHAR||':'||e.k") + " & 8191::UBIGINT) AS BIGINT) " +
        "GROUP BY e.k, e.exact"),
    // every CMS cell replayed bit-identically: same md5 row hashes,
    // same width-8192 mask, est = min over the 4 rows' cells
    "q_cms_topk" ->
      ("WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS k FROM documents), " +
        "ex AS (SELECT k, count(*) AS exact FROM tok GROUP BY k " +
        "ORDER BY exact DESC, k LIMIT 20), " +
        "sk AS (SELECT j, CAST((" + md5u("j::VARCHAR||':'||k") +
        " & 8191::UBIGINT) AS BIGINT) AS b, count(*) AS c " +
        "FROM tok, generate_series(0, 3) g(j) GROUP BY 1, 2) " +
        "SELECT e.k AS tok, e.exact, min(sk.c) AS est " +
        "FROM ex e CROSS JOIN generate_series(0, 3) g(j) " +
        "JOIN sk ON sk.j = g.j AND sk.b = CAST((" +
        md5u("g.j::VARCHAR||':'||e.k") + " & 8191::UBIGINT) AS BIGINT) " +
        "GROUP BY e.k, e.exact"),
    // the same 3 pagerank iterations as chained CTEs (no recursion
    // needed for a fixed iteration count)
    "graph_degrees" ->
      (graphEdgeCte.stripSuffix(", ") +
        " SELECT degree, count(*) AS n_nodes FROM (" +
        "SELECT src, count(*) AS degree FROM e GROUP BY src) GROUP BY degree"),
    // 18 unrolled peel rounds; MATERIALIZED is load-bearing — each
    // round references the previous edge set twice, so inlining the
    // 18-deep chain would duplicate the base scan 2^18 times
    "graph_kcore" ->
      (graphEdgeCte + "p0 AS MATERIALIZED (SELECT src, dst FROM e), " +
        (1 to 18).map { r =>
          s"k$r AS MATERIALIZED (SELECT src FROM p${r - 1} " +
            "GROUP BY src HAVING count(*) >= 8), " +
            s"p$r AS MATERIALIZED (SELECT c.src, c.dst FROM p${r - 1} c " +
            s"JOIN k$r a ON c.src = a.src JOIN k$r b ON c.dst = b.src)"
        }.mkString(", ") +
        " SELECT src AS node, count(*) AS deg FROM p18 GROUP BY src"),
    // 8 unrolled support-peel rounds (fixpoint at 4 at sf0.01);
    // support via the plain common-neighbor join — the oracle replays
    // semantics, the engine's degree-oriented enumeration is the
    // scale path
    "graph_ktruss" ->
      (graphEdgeCte + "c0 AS MATERIALIZED (SELECT src, dst FROM e WHERE src < dst), " +
        (1 to 8).map { r =>
          s"sym${r - 1} AS MATERIALIZED (SELECT src, dst FROM c${r - 1} " +
            s"UNION ALL SELECT dst, src FROM c${r - 1}), " +
            s"s$r AS MATERIALIZED (SELECT c.src, c.dst, count(*) AS sup " +
            s"FROM c${r - 1} c JOIN sym${r - 1} a ON a.src = c.src " +
            s"JOIN sym${r - 1} b ON b.src = c.dst AND b.dst = a.dst " +
            "GROUP BY 1, 2), " +
            s"c$r AS MATERIALIZED (SELECT c.src, c.dst FROM c${r - 1} c " +
            s"JOIN s$r s ON s.src = c.src AND s.dst = c.dst AND s.sup >= 3)"
        }.mkString(", ") +
        " SELECT c.src, c.dst, s.sup AS support FROM c8 c " +
        "JOIN s8 s ON s.src = c.src AND s.dst = c.dst"),
    // 56 unrolled h-index rounds (fixpoint at 46 at sf0.01; spares
    // are no-ops); MATERIALIZED for the same anti-inlining reason
    "graph_coreness" ->
      (graphEdgeCte + "e2 AS MATERIALIZED (SELECT src, dst FROM e), " +
        "cv0 AS MATERIALIZED (SELECT src AS node, count(*) AS c " +
        "FROM e2 GROUP BY src), " +
        (1 to 56).map { r =>
          s"cv$r AS MATERIALIZED (SELECT src AS node, max(least(rn, cd)) AS c " +
            "FROM (SELECT e2.src, v.c AS cd, row_number() OVER " +
            "(PARTITION BY e2.src ORDER BY v.c DESC) AS rn " +
            s"FROM e2 JOIN cv${r - 1} v ON e2.dst = v.node) GROUP BY src)"
        }.mkString(", ") +
        " SELECT node, c AS coreness FROM cv56"),
    "graph_clustering" ->
      (graphEdgeCte +
        "tri AS (SELECT count(*) AS n_triangles FROM e ab " +
        "JOIN e bc ON ab.dst = bc.src " +
        "JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst " +
        "WHERE ab.src < ab.dst AND bc.src < bc.dst), " +
        "wg AS (SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges " +
        "FROM (SELECT count(*) AS deg FROM e GROUP BY src)) " +
        "SELECT tri.n_triangles, wg.n_wedges, " +
        "round(tri.n_triangles * 3.0 / wg.n_wedges, 6) AS global_cc " +
        "FROM tri, wg"),
    "graph_assortativity" ->
      (graphEdgeCte +
        "deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src) " +
        "SELECT round(corr(a.deg, b.deg), 6) AS assortativity, " +
        "count(*) AS n_edges FROM e " +
        "JOIN deg a ON e.src = a.node JOIN deg b ON e.dst = b.node"),
    "graph_harmonic" ->
      (graphEdgeCte +
        "s AS (SELECT DISTINCT src AS node FROM e ORDER BY node LIMIT 16), " +
        "h0 AS MATERIALIZED (SELECT node AS s, node, 0 AS dist FROM s), " +
        (1 to 3).map { r =>
          s"h$r AS MATERIALIZED (SELECT s, node, min(dist) AS dist FROM (" +
            s"SELECT s, node, dist FROM h${r - 1} UNION ALL " +
            s"SELECT h.s, e.dst, h.dist + 1 FROM e JOIN h${r - 1} h " +
            "ON e.src = h.node) GROUP BY s, node)"
        }.mkString(", ") +
        " SELECT node, round(sum(1.0::DOUBLE / dist), 6) AS harmonic " +
        "FROM h3 WHERE dist > 0 GROUP BY node"),
    "graph_pagerank" ->
      (graphEdgeCte +
        "n AS (SELECT count(DISTINCT src) AS cnt FROM e), " +
        "deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src), " +
        "r0 AS (SELECT src AS node, 1.0 / cnt AS rank FROM deg, n), " +
        prIter("r1", "r0") + prIter("r2", "r1") + prIter("r3", "r2").stripSuffix(", ") +
        " SELECT node, round(rank, 8) AS rank FROM r3"),
    // 4 Bellman–Ford rounds over round6(1/co-purchase-count) weights
    // from the smallest part id, replayed as chained keep∪relax CTEs
    "graph_sssp" ->
      ("WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem " +
        "WHERE l_orderkey % 10 = 0), " +
        "g AS (SELECT l_orderkey FROM li GROUP BY l_orderkey " +
        "HAVING count(*) BETWEEN 2 AND 1000), " +
        "li2 AS (SELECT li.l_orderkey, li.l_partkey FROM li " +
        "JOIN g ON li.l_orderkey = g.l_orderkey), " +
        "ew AS (SELECT a.l_partkey AS src, b.l_partkey AS dst, " +
        "round(1.0::DOUBLE / count(*), 6) AS w " +
        "FROM li2 a JOIN li2 b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey != b.l_partkey GROUP BY 1, 2), " +
        "s AS (SELECT min(src) AS node FROM ew), " +
        "d0 AS (SELECT node, 0.0::DOUBLE AS dist FROM s), " +
        ssspIter("d1", "d0") + ssspIter("d2", "d1") +
        ssspIter("d3", "d2") + ssspIter("d4", "d3").stripSuffix(", ") +
        " SELECT node, round(dist, 6) AS dist FROM d4"),
    // fixpoint replay: 12 chained rounds — stable for the fixture
    // graph's diameter (rounds past convergence are no-ops). The edge
    // CTE is MATERIALIZED: un-materialized, every round re-scans the
    // parquet and 12 rounds exhaust the file-handle limit
    "graph_sssp_converged" ->
      ("WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem " +
        "WHERE l_orderkey % 10 = 0), " +
        "g AS (SELECT l_orderkey FROM li GROUP BY l_orderkey " +
        "HAVING count(*) BETWEEN 2 AND 1000), " +
        "li2 AS (SELECT li.l_orderkey, li.l_partkey FROM li " +
        "JOIN g ON li.l_orderkey = g.l_orderkey), " +
        "ew AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst, " +
        "round(1.0::DOUBLE / count(*), 6) AS w " +
        "FROM li2 a JOIN li2 b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey != b.l_partkey GROUP BY 1, 2), " +
        "s AS (SELECT min(src) AS node FROM ew), " +
        "d0 AS (SELECT node, 0.0::DOUBLE AS dist FROM s), " +
        (1 to 12).map(r => ssspIter(s"d$r", s"d${r - 1}")).mkString.stripSuffix(", ") +
        " SELECT node, round(dist, 6) AS dist FROM d12"),
    // random walk with restart: teleport mass pinned to the 5
    // smallest part ids; 3 damped rounds replayed as chained CTEs
    "graph_ppr" ->
      (graphEdgeCte +
        "deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src), " +
        "sd AS (SELECT DISTINCT src AS node FROM e ORDER BY src LIMIT 5), " +
        "ns AS (SELECT count(*) AS n_seeds FROM sd), " +
        "p0 AS (SELECT node, 1.0 / ns.n_seeds AS rank FROM sd, ns), " +
        pprIter("p1", "p0") + pprIter("p2", "p1") + pprIter("p3", "p2").stripSuffix(", ") +
        " SELECT node, round(rank, 8) AS rank FROM p3"),
    // replays the 3 label-propagation rounds (neighbor-label mode,
    // smallest label on ties) as chained CTEs
    "graph_communities" ->
      (graphEdgeCte +
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM e), " +
        lpRound("l1", "l0") + lpRound("l2", "l1") + lpRound("l3", "l2").stripSuffix(", ") +
        " SELECT label AS community, count(*) AS n_members FROM l3 GROUP BY label"),
    // the same LPA chain + Newman Q: intra/degree sums are exact
    // integers, the community-sized term sum rounds to 6dp
    "graph_modularity" ->
      (graphEdgeCte +
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM e), " +
        lpRound("l1", "l0") + lpRound("l2", "l1") + lpRound("l3", "l2") +
        "m AS (SELECT count(*) AS m2 FROM e), " +
        "intra AS (SELECT a.label, count(*) AS intra FROM e " +
        "JOIN l3 a ON e.src = a.node JOIN l3 b ON e.dst = b.node " +
        "WHERE a.label = b.label GROUP BY 1), " +
        "degc AS (SELECT l3.label, sum(d.deg) AS degc FROM " +
        "(SELECT src AS node, count(*) AS deg FROM e GROUP BY 1) d " +
        "JOIN l3 ON d.node = l3.node GROUP BY 1) " +
        "SELECT count(*) AS n_communities, " +
        "round(sum(coalesce(intra.intra, 0) * 1.0 / m.m2 " +
        "- (degc.degc * 1.0 / m.m2) * (degc.degc * 1.0 / m.m2)), 6) AS modularity " +
        "FROM degc LEFT JOIN intra ON degc.label = intra.label CROSS JOIN m"),
    // bounded BFS: 3 chained frontier rounds, min-distance per node
    "graph_bfs" ->
      (graphEdgeCte.stripSuffix(", ") + ", " +
        "s AS (SELECT min(src) AS node FROM e), " +
        "d0 AS (SELECT node, 0 AS dist FROM s), " +
        "d1 AS (SELECT node, min(dist) AS dist FROM (SELECT node, dist FROM d0 " +
        "UNION ALL SELECT e.dst, d0.dist + 1 FROM e JOIN d0 ON e.src = d0.node) GROUP BY node), " +
        "d2 AS (SELECT node, min(dist) AS dist FROM (SELECT node, dist FROM d1 " +
        "UNION ALL SELECT e.dst, d1.dist + 1 FROM e JOIN d1 ON e.src = d1.node) GROUP BY node), " +
        "d3 AS (SELECT node, min(dist) AS dist FROM (SELECT node, dist FROM d2 " +
        "UNION ALL SELECT e.dst, d2.dist + 1 FROM e JOIN d2 ON e.src = d2.node) GROUP BY node) " +
        "SELECT node, CAST(dist AS BIGINT) AS dist FROM d3"),
    // brute 3-way join with a<b<c counts the same triangles the
    // degree-oriented wedge join finds exactly once each
    "graph_triangles" ->
      (graphEdgeCte.stripSuffix(", ") +
        " SELECT count(*) AS n_triangles FROM e ab " +
        "JOIN e bc ON ab.dst = bc.src JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst " +
        "WHERE ab.src < ab.dst AND bc.src < bc.dst"),
    // epoch_us ordering matches Spark's microsecond timestamps; the
    // regex forbids crossing another funnel letter between steps, so
    // both engines' leftmost matching finds identical match sets
    "q_event_pattern" ->
      ("WITH s AS (SELECT user_id, " +
        "string_agg(substr(event_type, 1, 1), '' ORDER BY epoch_us(ts), event_id) AS seq, " +
        "count(*) AS n_events FROM events GROUP BY user_id) " +
        "SELECT user_id, CAST(n_events AS BIGINT) AS n_events, " +
        "CAST(len(regexp_extract_all(seq, 'v[^vcp]*c[^vcp]*p')) AS BIGINT) AS n_matches " +
        "FROM s WHERE len(regexp_extract_all(seq, 'v[^vcp]*c[^vcp]*p')) > 0"),
    // md5 ±1 planes ("proj:j:i") replayed per output dim; the norm is
    // list_dot_product(pj, pj) so the accumulation order matches the
    // engine's left-fold exactly
    "emb_quality" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "pv AS (SELECT len(v) AS dims, sqrt(list_dot_product(v, v)) AS nrm, " +
        "(SELECT bool_or(isnan(x) OR NOT isfinite(x)) FROM UNNEST(v) t(x)) AS bad " +
        "FROM v), " +
        "base AS (SELECT count(*) AS n_vecs, " +
        "count(DISTINCT dims) AS n_dim_variants, " +
        "round(min(nrm), 4) AS min_norm, round(max(nrm), 4) AS max_norm, " +
        "CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite FROM pv), " +
        "dv AS (SELECT i, sum(v[i] * v[i]) / count(*) " +
        "- (sum(v[i]) / count(*)) * (sum(v[i]) / count(*)) AS var " +
        "FROM v, generate_series(1, 64) t(i) GROUP BY i), " +
        "dead AS (SELECT count(*) AS n_dead_dims FROM dv WHERE var < 1e-9) " +
        "SELECT b.n_vecs, b.n_dim_variants, b.min_norm, b.max_norm, " +
        "b.n_nonfinite, d.n_dead_dims FROM base b, dead d"),
    "emb_pca" -> pcaSql,
    "emb_pca_delete" -> pcaDeleteSql,
    "emb_pca_incr" -> pcaSql,
    "emb_pca_whiten" -> pcaWhitenSql,
    "emb_project" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "pl AS (SELECT j, list(CASE WHEN " +
        "('0x'||substr(md5('proj:'||j||':'||(i-1)), 1, 16))::UBIGINT & 1 = 1 " +
        "THEN 1.0 ELSE -1.0 END ORDER BY i) AS plane " +
        "FROM generate_series(0, 15) jj(j), generate_series(1, 64) ii(i) GROUP BY j), " +
        "p AS (SELECT vec_id, j, list_dot_product(x.v, pl.plane) AS pv FROM v x, pl), " +
        "w AS (SELECT vec_id, list(pv ORDER BY j) AS pj FROM p GROUP BY vec_id) " +
        "SELECT vec_id, round(pj[1], 4) AS p0, round(pj[2], 4) AS p1, " +
        "round(pj[3], 4) AS p2, round(pj[4], 4) AS p3, " +
        "round(sqrt(list_dot_product(pj, pj)), 4) AS pnorm FROM w"),
    "q_zorder_sink" ->
      ("SELECT l_suppkey, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty " +
        "FROM lineitem WHERE l_partkey BETWEEN 10 AND 80 " +
        "AND l_suppkey BETWEEN 2 AND 6 GROUP BY l_suppkey"),
    // replays all 3 Lloyd's rounds (mean centroids -> argmax-cosine
    // reassignment, lowest cluster on ties) as chained CTEs, then the
    // final-census round
    "emb_kmeans" ->
      ("WITH va AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "a0 AS (SELECT vec_id, v, vec_id % 8 AS cl FROM va), " +
        kmRound("c1", "a1", "a0") + kmRound("c2", "a2", "a1") +
        kmRound("c3", "a3", "a2") +
        "cf AS (SELECT cl AS fcl, list(cv ORDER BY i) AS centroid FROM (" +
        "SELECT cl, i, avg(v[i]) AS cv FROM a3, generate_series(1, 64) t(i) " +
        "GROUP BY cl, i) GROUP BY cl) " +
        "SELECT a3.cl, count(*) AS n_members, " +
        "round(avg(list_cosine_similarity(a3.v, cf.centroid)), 4) AS mean_cos " +
        "FROM a3 JOIN cf ON a3.cl = cf.fcl GROUP BY a3.cl"),
    // cluster-balanced quota: the replayed k-means assignment cut to
    // 10 vectors per cluster in md5('cbal:'||id) order
    "emb_cluster_sample" ->
      ("WITH va AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "a0 AS (SELECT vec_id, v, vec_id % 8 AS cl FROM va), " +
        kmRound("c1", "a1", "a0") + kmRound("c2", "a2", "a1") +
        kmRound("c3", "a3", "a2").stripSuffix(", ") +
        " SELECT cl, vec_id FROM (SELECT cl, vec_id, " +
        "row_number() OVER (PARTITION BY cl " +
        "ORDER BY md5('cbal:'||vec_id), vec_id) AS rn FROM a3) WHERE rn <= 10"),
    // simplified silhouette over the replayed 3-round k-means: per
    // vector a = dist to own centroid, b = min dist to another
    "emb_silhouette" ->
      ("WITH va AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "a0 AS (SELECT vec_id, v, vec_id % 8 AS cl FROM va), " +
        kmRound("c1", "a1", "a0") + kmRound("c2", "a2", "a1") +
        kmRound("c3", "a3", "a2") +
        "cf AS (SELECT cl AS fcl, list(cv ORDER BY i) AS centroid FROM (" +
        "SELECT cl, i, avg(v[i]) AS cv FROM a3, generate_series(1, 64) t(i) " +
        "GROUP BY cl, i) GROUP BY cl), " +
        "d AS (SELECT a3.vec_id, a3.cl, cf.fcl, " +
        "1.0 - list_cosine_similarity(a3.v, cf.centroid) AS dist FROM a3, cf), " +
        "ab AS (SELECT vec_id, cl, max(CASE WHEN cl = fcl THEN dist END) AS a, " +
        "min(CASE WHEN cl <> fcl THEN dist END) AS b FROM d GROUP BY vec_id, cl), " +
        "sil AS (SELECT cl, CASE WHEN greatest(a, b) = 0 THEN 0.0 " +
        "ELSE (b - a) / greatest(a, b) END AS s FROM ab) " +
        "SELECT cl, count(*) AS n_members, round(avg(s), 4) AS mean_sil " +
        "FROM sil GROUP BY cl"),
    // coverage thresholds are exact integer comparisons (cum*100 >= p*total)
    "text_vocab_coverage" ->
      ("WITH f AS (SELECT tok, count(*) AS cnt FROM " +
        "(SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents) GROUP BY 1), " +
        "c AS (SELECT tok, cnt, CAST(sum(cnt) OVER w AS BIGINT) AS cum_tokens, " +
        "row_number() OVER w AS rank, CAST(sum(cnt) OVER () AS BIGINT) AS total FROM f " +
        "WINDOW w AS (ORDER BY cnt DESC, tok ROWS UNBOUNDED PRECEDING)), " +
        "p AS (SELECT pct, rank, cum_tokens, total FROM (VALUES (50), (90), (99)) t(pct), c " +
        "WHERE cum_tokens * 100 >= pct * total) " +
        "SELECT pct::BIGINT AS pct, min(rank) AS k_types, " +
        "CAST(min_by(cum_tokens, rank) AS BIGINT) AS covered_tokens, " +
        "round(min_by(cum_tokens, rank) * 1.0 / min(total), 6) AS coverage " +
        "FROM p GROUP BY 1"),
    // replays the full recall measurement: md5-plane projection, exact
    // 64-dim top-5, projected 16-dim top-5, per-query intersection
    "emb_recall" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "pl AS (SELECT j, list(CASE WHEN " +
        "('0x'||substr(md5('proj:'||j||':'||(i-1)), 1, 16))::UBIGINT & 1 = 1 " +
        "THEN 1.0 ELSE -1.0 END ORDER BY i) AS plane " +
        "FROM generate_series(0, 15) jj(j), generate_series(1, 64) ii(i) GROUP BY j), " +
        "p AS (SELECT vec_id, j, list_dot_product(x.v, pl.plane) AS pv FROM v x, pl), " +
        "pj AS (SELECT vec_id, list(pv ORDER BY j) AS v FROM p GROUP BY vec_id), " +
        "fullr AS (SELECT query_id, neighbor_id FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id) AS rank " +
        "FROM v q JOIN v c ON q.vec_id != c.vec_id WHERE q.vec_id < 20) WHERE rank <= 5), " +
        "projr AS (SELECT query_id, neighbor_id FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id) AS rank " +
        "FROM pj q JOIN pj c ON q.vec_id != c.vec_id WHERE q.vec_id < 20) WHERE rank <= 5) " +
        "SELECT query_id, count(*) / 5.0 AS recall5 " +
        "FROM fullr JOIN projr USING (query_id, neighbor_id) GROUP BY query_id"),
    // corpus LM capped as in text_lm_score; add-1 smoothing over the
    // FULL vocabulary count (cap-independent constant)
    "text_importance" -> importanceSql,
    // DSIR resampling: accept if md5-gate < floor(round6(p)·16384),
    // p = min(1, 0.5·e^w / round6(mean e^w)) over the replayed weights
    "corpus_resample" ->
      ("WITH imp AS (" + importanceSql + "), " +
        "m AS (SELECT round(avg(exp(importance)), 6) AS mex FROM imp), " +
        "g AS (SELECT i.doc_id, i.importance FROM imp i, m " +
        "WHERE (('0x'||substr(md5('rs:'||i.doc_id), 1, 16))::UBIGINT & 16383)::BIGINT " +
        "< floor(round(least(1.0, 0.5 * exp(i.importance) / m.mex), 6) * 16384)) " +
        "SELECT d.source, count(*) AS n_kept, " +
        "round(avg(g.importance), 4) AS avg_importance " +
        "FROM g JOIN documents d USING (doc_id) GROUP BY d.source"),
    "stream_curate" ->
      ("SELECT d.source, count(*) AS n_docs, " +
        "CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS sum_tokens " +
        "FROM documents d " +
        "JOIN (" + qualitySql + ") q ON d.doc_id = q.doc_id " +
        "JOIN (" + langidSql + ") l ON d.doc_id = l.doc_id " +
        "WHERE q.quality >= 0.5 AND l.pred_lang = 'en' GROUP BY d.source"),
    // replays the capped LM: min-count floor + top-K vocabulary
    // (cnt DESC, tok ASC tie-break), dropped mass spread evenly over
    // dropped types as the OOV probability
    "text_lm_score" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok " +
        "FROM documents), " +
        "freq AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok), " +
        "tot AS (SELECT sum(cnt) AS total, count(*) AS vocab_all FROM freq), " +
        "kept AS (SELECT tok, cnt FROM freq WHERE cnt >= 2 " +
        "QUALIFY row_number() OVER (ORDER BY cnt DESC, tok) <= 20), " +
        "ks AS (SELECT sum(cnt) AS kept_total, count(*) AS kept_types FROM kept), " +
        "ov AS (SELECT total, " +
        "(total - kept_total) / (vocab_all - kept_types) / total AS p_oov " +
        "FROM tot, ks) " +
        "SELECT doc_id, count(*) AS n_tokens, " +
        "round(avg(CASE WHEN cnt IS NOT NULL THEN -ln(cnt / total) " +
        "ELSE -ln(p_oov) END), 4) AS nll " +
        "FROM tok LEFT JOIN kept USING (tok), ov GROUP BY doc_id"),
    // the LM CTEs restricted to the train split; held-out tokens fall
    // to the OOV branch exactly as the engine's getOrElse does
    "text_lm_heldout" ->
      ("WITH tr AS (SELECT * FROM documents WHERE " +
        "(('0x'||substr(md5('split:'||doc_id), 13, 4))::UINTEGER % 16384) % 10 <= 7), " +
        "te AS (SELECT * FROM documents WHERE " +
        "(('0x'||substr(md5('split:'||doc_id), 13, 4))::UINTEGER % 16384) % 10 = 9), " +
        "tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM tr), " +
        "freq AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok), " +
        "tot AS (SELECT sum(cnt) AS total, count(*) AS vocab_all FROM freq), " +
        "kept AS (SELECT tok, cnt FROM freq WHERE cnt >= 2 " +
        "QUALIFY row_number() OVER (ORDER BY cnt DESC, tok) <= 20), " +
        "ks AS (SELECT sum(cnt) AS kept_total, count(*) AS kept_types FROM kept), " +
        "ov AS (SELECT total, " +
        "(total - kept_total) / (vocab_all - kept_types) / total AS p_oov " +
        "FROM tot, ks), " +
        "ttok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM te) " +
        "SELECT doc_id, count(*) AS n_tokens, " +
        "round(avg(CASE WHEN cnt IS NOT NULL THEN -ln(cnt / total) " +
        "ELSE -ln(p_oov) END), 4) AS nll " +
        "FROM ttok LEFT JOIN kept USING (tok), ov GROUP BY doc_id"),
    // replays the text_lm_score LM, then the tercile thresholds as
    // running counts over the per-(lang, nll) table
    "text_ppl_buckets" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok " +
        "FROM documents), " +
        "freq AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok), " +
        "tot AS (SELECT sum(cnt) AS total, count(*) AS vocab_all FROM freq), " +
        "kept AS (SELECT tok, cnt FROM freq WHERE cnt >= 2 " +
        "QUALIFY row_number() OVER (ORDER BY cnt DESC, tok) <= 20), " +
        "ks AS (SELECT sum(cnt) AS kept_total, count(*) AS kept_types FROM kept), " +
        "ov AS (SELECT total, " +
        "(total - kept_total) / (vocab_all - kept_types) / total AS p_oov " +
        "FROM tot, ks), " +
        "scored AS (SELECT doc_id, " +
        "round(avg(CASE WHEN cnt IS NOT NULL THEN -ln(cnt / total) " +
        "ELSE -ln(p_oov) END), 4) AS nll " +
        "FROM tok LEFT JOIN kept USING (tok), ov GROUP BY doc_id), " +
        "sl AS (SELECT s.doc_id, d.lang, s.nll FROM scored s " +
        "JOIN documents d USING (doc_id)), " +
        "counts AS (SELECT lang, nll, count(*) AS c FROM sl GROUP BY 1, 2), " +
        "cum AS (SELECT lang, nll, c, " +
        "sum(c) OVER (PARTITION BY lang ORDER BY nll) AS cum FROM counts), " +
        "tot2 AS (SELECT lang, sum(c) AS n FROM counts GROUP BY 1), " +
        "thr AS (SELECT cum.lang, " +
        "min(CASE WHEN cum >= ceil(n / 3.0) THEN nll END) AS t1, " +
        "min(CASE WHEN cum >= ceil(n * 2.0 / 3.0) THEN nll END) AS t2 " +
        "FROM cum JOIN tot2 USING (lang) GROUP BY 1) " +
        "SELECT sl.lang, CASE WHEN nll <= t1 THEN 'head' " +
        "WHEN nll <= t2 THEN 'middle' ELSE 'tail' END AS bucket, " +
        "count(*) AS n_docs, round(avg(nll), 4) AS avg_nll " +
        "FROM sl JOIN thr ON sl.lang = thr.lang GROUP BY 1, 2"),
    // the composed CCNet decision: langid CTE + the capped-LM scoring
    // + per-predicted-language terciles + keep head+middle
    "pipeline_ccnet" ->
      ("WITH lang AS (" + langidSql + "), " +
        "tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok " +
        "FROM documents), " +
        "freq AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok), " +
        "tot AS (SELECT sum(cnt) AS total, count(*) AS vocab_all FROM freq), " +
        "kept AS (SELECT tok, cnt FROM freq WHERE cnt >= 2 " +
        "QUALIFY row_number() OVER (ORDER BY cnt DESC, tok) <= 20), " +
        "ks AS (SELECT sum(cnt) AS kept_total, count(*) AS kept_types FROM kept), " +
        "ov AS (SELECT total, " +
        "(total - kept_total) / (vocab_all - kept_types) / total AS p_oov " +
        "FROM tot, ks), " +
        "scored AS (SELECT doc_id, " +
        "round(avg(CASE WHEN cnt IS NOT NULL THEN -ln(cnt / total) " +
        "ELSE -ln(p_oov) END), 4) AS nll " +
        "FROM tok LEFT JOIN kept USING (tok), ov GROUP BY doc_id), " +
        "sl AS (SELECT s.doc_id, l.pred_lang, s.nll FROM scored s " +
        "JOIN lang l USING (doc_id)), " +
        "counts AS (SELECT pred_lang, nll, count(*) AS c FROM sl GROUP BY 1, 2), " +
        "cum AS (SELECT pred_lang, nll, c, " +
        "sum(c) OVER (PARTITION BY pred_lang ORDER BY nll) AS cum FROM counts), " +
        "tot2 AS (SELECT pred_lang, sum(c) AS n FROM counts GROUP BY 1), " +
        "thr AS (SELECT cum.pred_lang, " +
        "min(CASE WHEN cum >= ceil(n / 3.0) THEN nll END) AS t1, " +
        "min(CASE WHEN cum >= ceil(n * 2.0 / 3.0) THEN nll END) AS t2 " +
        "FROM cum JOIN tot2 USING (pred_lang) GROUP BY 1), " +
        "b AS (SELECT sl.pred_lang, sl.nll, " +
        "CASE WHEN nll <= t1 THEN 'head' WHEN nll <= t2 THEN 'middle' " +
        "ELSE 'tail' END AS bucket " +
        "FROM sl JOIN thr ON sl.pred_lang = thr.pred_lang) " +
        "SELECT pred_lang, count(*) AS n_docs, " +
        "count(*) FILTER (bucket IN ('head', 'middle')) AS n_kept, " +
        "round(avg(nll) FILTER (bucket IN ('head', 'middle')), 4) AS kept_avg_nll " +
        "FROM b GROUP BY 1"),
    // --- corpus curation (round 3) ---
    "text_decontaminate_fuzzy" ->
      ("WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
        "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
        "pairs AS (SELECT a.doc_id AS eval_id, b.doc_id AS did, count(*) AS inter " +
        "FROM sh a JOIN sh b ON a.shingle = b.shingle " +
        "AND a.doc_id % 50 = 0 AND b.doc_id % 50 != 0 GROUP BY 1, 2) " +
        "SELECT eval_id, did AS doc_id, " +
        "round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard " +
        "FROM pairs JOIN sizes sa ON eval_id = sa.doc_id " +
        "JOIN sizes sb ON did = sb.doc_id " +
        "WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5"),
    "pipeline_decontaminate" ->
      ("WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
        "ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0), " +
        "tr AS (SELECT * FROM sh WHERE doc_id % 50 != 0), " +
        "exact_hits AS (SELECT tr.doc_id FROM tr JOIN ev USING (shingle) " +
        "GROUP BY tr.doc_id HAVING count(*) >= 3), " +
        "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
        "pairs AS (SELECT a.doc_id AS eval_id, b.doc_id AS did, count(*) AS inter " +
        "FROM sh a JOIN sh b ON a.shingle = b.shingle " +
        "AND a.doc_id % 50 = 0 AND b.doc_id % 50 != 0 GROUP BY 1, 2), " +
        "fuzzy_hits AS (SELECT did AS doc_id FROM pairs " +
        "JOIN sizes sa ON eval_id = sa.doc_id JOIN sizes sb ON did = sb.doc_id " +
        "WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5), " +
        "dropped AS (SELECT doc_id FROM exact_hits " +
        "UNION SELECT doc_id FROM fuzzy_hits), " +
        "base AS (SELECT doc_id, source FROM documents WHERE doc_id % 50 != 0), " +
        "kept AS (SELECT b.source FROM base b LEFT JOIN dropped d " +
        "ON b.doc_id = d.doc_id WHERE d.doc_id IS NULL), " +
        "tot AS (SELECT source, count(*) AS n_total FROM base GROUP BY source), " +
        "k AS (SELECT source, count(*) AS n_kept FROM kept GROUP BY source) " +
        "SELECT t.source, k.n_kept, t.n_total, " +
        "round(k.n_kept * 1.0 / t.n_total, 4) AS retention " +
        "FROM tot t JOIN k ON t.source = k.source"),
    "text_decontaminate" ->
      ("WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
        "ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0), " +
        "tr AS (SELECT * FROM sh WHERE doc_id % 50 != 0) " +
        "SELECT tr.doc_id, count(*) AS n_shared FROM tr " +
        "JOIN ev ON tr.shingle = ev.shingle GROUP BY tr.doc_id"),
    "text_chunks" ->
      ("WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "n AS (SELECT doc_id, w, " +
        "greatest(CAST(ceil((len(w) - 8) / 24.0) AS BIGINT), 1) AS nc FROM tok) " +
        "SELECT doc_id, i AS chunk_id, " +
        "md5(array_to_string(w[(i*24+1):(i*24+32)], ' ')) AS chunk_md5, " +
        "len(w[(i*24+1):(i*24+32)]) AS n_tokens " +
        "FROM n, UNNEST(generate_series(0, nc - 1)) t(i)"),
    "text_repetition" ->
      ("WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents), " +
        "g AS (SELECT doc_id, w, " +
        "[array_to_string(w[i:i+1], ' ') for i in generate_series(1, greatest(len(w)-1, 0))] AS g2, " +
        "[array_to_string(w[i:i+2], ' ') for i in generate_series(1, greatest(len(w)-2, 0))] AS g3 " +
        "FROM tok) " +
        "SELECT doc_id, len(w) AS n_tokens, " +
        "round((len(w) - len(list_distinct(w))) * 1.0 / len(w), 4) AS dup_token_frac, " +
        "CASE WHEN len(g2) > 0 THEN round(list_max([len(list_filter(g2, x -> x = d)) " +
        "for d in list_distinct(g2)]) * 1.0 / len(g2), 4) ELSE 0.0 END AS top2_frac, " +
        "CASE WHEN len(g3) > 0 THEN round(list_max([len(list_filter(g3, x -> x = d)) " +
        "for d in list_distinct(g3)]) * 1.0 / len(g3), 4) ELSE 0.0 END AS top3_frac " +
        "FROM g"),
    "text_redact" ->
      ("WITH p AS (SELECT doc_id, concat(text, ' contact user', doc_id, " +
        "'@mail.example.com from 10.', doc_id % 200, '.0.1 call 555-', " +
        "1000 + doc_id % 9000) AS s FROM documents) " +
        "SELECT doc_id, " +
        "CAST(len(regexp_extract_all(s, '[a-z0-9._]+@[a-z0-9.]+[a-z]')) AS BIGINT) AS n_emails, " +
        "CAST(len(regexp_extract_all(s, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+')) AS BIGINT) AS n_ips, " +
        "CAST(len(regexp_extract_all(s, '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones, " +
        "md5(regexp_replace(regexp_replace(regexp_replace(s, " +
        "'[a-z0-9._]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g'), " +
        "'[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '<IP>', 'g'), " +
        "'[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5 FROM p"),
    // bottom-5 of the signed md5 hash order per source, doc_id tiebreak
    "corpus_bottomk" ->
      ("WITH h AS (SELECT source, doc_id, " +
        wrapSigned(md5u("'bk:'||doc_id")) + " AS bk FROM documents), " +
        "r AS (SELECT source, doc_id, " +
        "row_number() OVER (PARTITION BY source ORDER BY bk, doc_id) AS rn FROM h) " +
        "SELECT source, doc_id FROM r WHERE rn <= 5"),
    "corpus_sample" ->
      ("WITH k AS (SELECT lang, " +
        "CASE WHEN lang = 'en' THEN 3276 WHEN lang = 'fr' THEN 8192 ELSE 13107 END AS thr, " +
        "(('0x'||substr(md5('strat:'||doc_id), 1, 16))::UBIGINT & 16383) AS h " +
        "FROM documents) " +
        "SELECT lang, count(*) AS n_total, " +
        "CAST(sum(CASE WHEN h < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept " +
        "FROM k GROUP BY lang"),
    // replays the sqrt-smoothed allocation: list_sum over
    // source-sorted weights reproduces the engine's fold order, so
    // the 16384-bucket thresholds are bit-identical
    "corpus_mix" ->
      ("WITH tok AS (SELECT source, doc_id, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok FROM documents), " +
        "tot AS (SELECT source, sum(ntok) AS toks FROM tok GROUP BY source), " +
        "sw AS (SELECT list_sum(list(sqrt(toks) ORDER BY source)) AS sumw FROM tot), " +
        "thr AS (SELECT source, " +
        "CAST(floor(round(least(1.0, (10000 * sqrt(toks) / sumw) / toks), 6) * 16384) AS BIGINT) " +
        "AS thr FROM tot, sw), " +
        "k AS (SELECT t.source, t.ntok, thr.thr, " +
        "(('0x'||substr(md5('mix:'||t.doc_id), 1, 16))::UBIGINT & 16383) AS h " +
        "FROM tok t JOIN thr ON t.source = thr.source) " +
        "SELECT source, CAST(min(thr) AS BIGINT) AS thr, count(*) AS n_kept, " +
        "CAST(sum(ntok) AS BIGINT) AS tokens_kept FROM k WHERE h < thr GROUP BY source"),
    // τ=0.3 temperature mix: pow(toks, 0.3) weights; ulp differences
    // between engines' pow are absorbed by the round6-before-floor
    "corpus_mix_temp" ->
      ("WITH tok AS (SELECT source, doc_id, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok FROM documents), " +
        "tot AS (SELECT source, sum(ntok) AS toks FROM tok GROUP BY source), " +
        "sw AS (SELECT list_sum(list(pow(toks, 0.3) ORDER BY source)) AS sumw FROM tot), " +
        "thr AS (SELECT source, " +
        "CAST(floor(round(least(1.0, (10000 * pow(toks, 0.3) / sumw) / toks), 6) * 16384) AS BIGINT) " +
        "AS thr FROM tot, sw), " +
        "k AS (SELECT t.source, t.ntok, thr.thr, " +
        "(('0x'||substr(md5('mix:'||t.doc_id), 1, 16))::UBIGINT & 16383) AS h " +
        "FROM tok t JOIN thr ON t.source = thr.source) " +
        "SELECT source, CAST(min(thr) AS BIGINT) AS thr, count(*) AS n_kept, " +
        "CAST(sum(ntok) AS BIGINT) AS tokens_kept FROM k WHERE h < thr GROUP BY source"),
    // fractional-repetition rebalance: uniform 26000/20-token target
    // per source; n = ⌊rate⌋ + md5-gate on the round6'd remainder
    "corpus_upsample" ->
      ("WITH tok AS (SELECT source, doc_id, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok, " +
        "(('0x'||substr(md5('ups:'||doc_id), 1, 16))::UBIGINT & 16383) AS h FROM documents), " +
        "tot AS (SELECT source, sum(ntok) AS toks FROM tok GROUP BY source), " +
        "r AS (SELECT source, round((26000.0 / (SELECT count(*) FROM tot)) / toks, 6) " +
        "AS rate FROM tot), " +
        "c AS (SELECT tok.source, tok.doc_id, tok.ntok, " +
        "CAST(floor(rate) AS BIGINT) + (CASE WHEN tok.h < " +
        "floor(round(rate - floor(rate), 6) * 16384) THEN 1 ELSE 0 END) AS n " +
        "FROM tok JOIN r ON tok.source = r.source) " +
        "SELECT source, CAST(sum(n) AS BIGINT) AS n_rows_out, " +
        "CAST(sum(n * ntok) AS BIGINT) AS tokens_out, " +
        "CAST(count(*) FILTER (n > 0) AS BIGINT) AS n_docs " +
        "FROM c GROUP BY source HAVING sum(n) > 0"),
    "corpus_pack" ->
      ("WITH d AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n FROM documents), " +
        "c AS (SELECT source, doc_id, n, sum(n) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) AS cum FROM d) " +
        "SELECT source, CAST(floor((cum - n) / 256.0) AS BIGINT) AS seq_id, " +
        "count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens " +
        "FROM c GROUP BY source, seq_id"),
    "emb_quantize" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "s AS (SELECT vec_id, v, list_max([abs(x) for x in v]) / 127.0 AS scale FROM v), " +
        "q AS (SELECT vec_id, v, scale, " +
        "[CAST(floor(x / scale + 0.5) AS BIGINT) for x in v] AS q FROM s) " +
        "SELECT vec_id, " +
        "round(sqrt(list_reduce(list_prepend(0.0, [x * x for x in v]), (a, b) -> a + b)), 4) " +
        "AS l2_norm, round(scale, 6) AS scale, " +
        "CAST(list_sum(q) AS BIGINT) AS sum_q, " +
        "CAST(list_sum([abs(x) for x in q]) AS BIGINT) AS sum_abs_q FROM q"),
    // the rewrite is content-preserving, so the original table IS the oracle
    "q_zonemap_prune" ->
      ("SELECT l_returnflag, count(*) AS n, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue FROM lineitem " +
        "WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-03-31' " +
        "GROUP BY l_returnflag"),
    // full replay of the paragraph rewrite: 15-token units, global
    // keep-first in (doc order, position), per-doc reassembly
    "dedup_paragraphs" -> paragraphSql(""),
    // the incremental rewrite must equal the GLOBAL rewrite
    // restricted to the batch (corpus order keys all precede it)
    "dedup_paragraphs_incr" -> paragraphSql(
      " WHERE t.doc_id >= (SELECT (max(doc_id) + 1) * 9 // 10 FROM documents)"),
    // unit DELETE-mask replay: a batch unit is kept iff its hash has
    // no SURVIVING corpus-first owner and it is the batch's own first
    "dedup_paragraphs_del" ->
      ("WITH cut AS (SELECT (max(doc_id) + 1) * 9 // 10 AS c FROM documents), " +
        "sp AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
        "w AS (SELECT doc_id, unnest(ws) AS word, " +
        "generate_subscripts(ws, 1) AS i FROM sp), " +
        "p AS (SELECT doc_id, CAST(floor((i - 1) / 15) AS BIGINT) AS pidx, " +
        "string_agg(word, ' ' ORDER BY i) AS ptext " +
        "FROM w GROUP BY doc_id, floor((i - 1) / 15)), " +
        "fc AS (SELECT ptext, odoc FROM (SELECT p.ptext, p.doc_id AS odoc, " +
        "row_number() OVER (PARTITION BY p.ptext ORDER BY p.doc_id, p.pidx) AS rn " +
        "FROM p, cut WHERE p.doc_id < cut.c) WHERE rn = 1), " +
        "vo AS (SELECT ptext FROM fc WHERE odoc % 7 != 1), " +
        "bp AS (SELECT p.doc_id, p.pidx, p.ptext FROM p, cut WHERE p.doc_id >= cut.c), " +
        "bf AS (SELECT ptext, bdoc, bpidx FROM (SELECT ptext, doc_id AS bdoc, " +
        "pidx AS bpidx, row_number() OVER (PARTITION BY ptext " +
        "ORDER BY doc_id, pidx) AS rn FROM bp) WHERE rn = 1), " +
        "kept AS (SELECT bp.doc_id, bp.pidx, bp.ptext FROM bp " +
        "LEFT JOIN vo ON bp.ptext = vo.ptext JOIN bf ON bp.ptext = bf.ptext " +
        "WHERE vo.ptext IS NULL AND bp.doc_id = bf.bdoc AND bp.pidx = bf.bpidx), " +
        "r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, " +
        "string_agg(ptext, ' ' ORDER BY pidx) AS text_kept FROM kept GROUP BY doc_id), " +
        "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras FROM bp GROUP BY doc_id) " +
        "SELECT tot.doc_id, tot.n_paras, CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept, " +
        "coalesce(r.text_kept, '') AS text_kept FROM tot LEFT JOIN r " +
        "ON tot.doc_id = r.doc_id"),
    // SNM window w=10 over (s, id) order; same corrupted base as er_editdist
    "er_sorted_neighborhood" ->
      ("WITH base AS (SELECT p_partkey AS id, p_name AS s FROM part " +
        "UNION ALL SELECT p_partkey + 1000000, " +
        "substr(p_name, 1, length(p_name) - 1) || 'x' FROM part WHERE p_partkey % 100 = 0), " +
        "r AS (SELECT id, s, row_number() OVER (ORDER BY s, id) AS rn FROM base) " +
        "SELECT a.id AS a_id, b.id AS b_id, CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist " +
        "FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 10 " +
        "WHERE levenshtein(a.s, b.s) <= 2"),
    // verdict rows for every constraint over the corrupted union
    "q_constraints" ->
      ("WITH bad AS (SELECT o_orderkey, o_custkey + 900000000 AS o_custkey, " +
        "'X' AS o_orderstatus, -o_totalprice AS o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderkey % 500 = 0), " +
        "o AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate " +
        "FROM orders UNION ALL SELECT * FROM bad), " +
        "v AS (" +
        "SELECT 'o_custkey_not_null' AS check_name, " +
        "CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS violations FROM o " +
        "UNION ALL SELECT 'o_orderdate_in_window', CAST(count(*) FILTER (WHERE NOT " +
        "(o_orderdate BETWEEN TIMESTAMP '1990-01-01' AND TIMESTAMP '2000-12-31')) AS BIGINT) FROM o " +
        "UNION ALL SELECT 'o_orderstatus_accepted', " +
        "CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT) FROM o " +
        "UNION ALL SELECT 'o_totalprice_nonneg', " +
        "CAST(count(*) FILTER (WHERE NOT (o_totalprice >= 0)) AS BIGINT) FROM o " +
        "UNION ALL SELECT 'o_orderkey_unique', CAST(coalesce((SELECT sum(n) FROM " +
        "(SELECT count(*) AS n FROM o GROUP BY o_orderkey) WHERE n > 1), 0) AS BIGINT) " +
        "UNION ALL SELECT 'o_custkey_fk_customer', CAST(count(*) FILTER (WHERE o_custkey " +
        "NOT IN (SELECT c_custkey FROM customer)) AS BIGINT) FROM o) " +
        "SELECT check_name, violations, violations = 0 AS passed FROM v"),
    // delete maintenance: corpus side minus the tombstoned ids
    "dedup_index_delete" -> incrementalDedupSqlWith("AND b.doc_id % 7 <> 5 "),
    // frozen quantizer (trained on ALL vectors) + candidate exclusion
    "ann_index_delete" -> ivfPqSql("", "AND a.vec_id % 7 != 3 "),
    // replays the deterministic keyspace generator (pools[i%4]:i)
    "q_keys_minmax" ->
      ("WITH k AS (SELECT concat(CASE WHEN i % 4 = 0 THEN 'user' " +
        "WHEN i % 4 = 1 THEN 'order' WHEN i % 4 = 2 THEN 'item' " +
        "ELSE 'session' END, ':', i) AS key " +
        "FROM (SELECT unnest(generate_series(0, 1999)) AS i)) " +
        "SELECT min(key) AS min_key, max(key) AS max_key, count(*) AS n FROM k"),
    // the keyspace generator + CRC16 slot replay, grouped per slot
    "q_keys_groupcount" ->
      ("WITH k AS (SELECT concat(CASE WHEN i % 4 = 0 THEN 'user' " +
        "WHEN i % 4 = 1 THEN 'order' WHEN i % 4 = 2 THEN 'item' " +
        "ELSE 'session' END, ':', i) AS key " +
        "FROM (SELECT unnest(generate_series(0, 1999)) AS i)), " +
        "sl AS (SELECT key, " + crcSql("key") + " & 16383 AS slot FROM k) " +
        "SELECT CAST(slot AS BIGINT) AS slot, count(*) AS n, " +
        "min(key) AS min_key FROM sl GROUP BY 1"),
    "q_k_anonymity" ->
      ("SELECT c_nationkey, c_mktsegment, count(*) AS n_rows FROM customer " +
        "GROUP BY 1, 2 HAVING count(*) < 8"),
    "q_zonemap_zorder" ->
      ("SELECT l_suppkey, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty " +
        "FROM lineitem WHERE l_partkey BETWEEN 10 AND 80 " +
        "AND l_suppkey BETWEEN 2 AND 6 GROUP BY l_suppkey"),
    // near-dup pairs + recursive-CTE clusters + the md5 split replay:
    // doc-id splits leak pairs across the boundary, cluster splits
    // provably cannot
    "corpus_split_leakage" -> {
      def splitSql(e: String): String =
        s"(CASE WHEN (('0x'||substr(md5('split:'||$e), 13, 4))::UINTEGER % 16384) % 10 <= 7 " +
          s"THEN 'train' WHEN (('0x'||substr(md5('split:'||$e), 13, 4))::UINTEGER % 16384) % 10 = 8 " +
          "THEN 'val' ELSE 'test' END)"
      "WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle " +
        "FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)), " +
        "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
        "pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter " +
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "pairs AS (SELECT a_id, b_id FROM pr JOIN sizes sa ON a_id = sa.doc_id " +
        "JOIN sizes sb ON b_id = sb.doc_id WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7), " +
        "edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION SELECT b_id, a_id FROM pairs), " +
        "reach(u, v) AS (SELECT u, v FROM edges UNION " +
        "SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), " +
        "cl AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u) " +
        s"SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        s"CAST(sum(CASE WHEN ${splitSql("p.a_id")} <> ${splitSql("p.b_id")} THEN 1 ELSE 0 END) AS BIGINT) AS leaked_doc_split, " +
        s"CAST(sum(CASE WHEN ${splitSql("ca.cluster_id")} <> ${splitSql("cb.cluster_id")} THEN 1 ELSE 0 END) AS BIGINT) AS leaked_cluster_split " +
        "FROM pairs p JOIN cl ca ON p.a_id = ca.doc_id JOIN cl cb ON p.b_id = cb.doc_id"
    },
    // quality + langid CTEs reused verbatim; PII regexes = the redact
    // rules; the avg is over the same round-6 per-doc quality
    "corpus_datasheet" ->
      ("WITH q AS (" + qualitySql + "), pl AS (" + langidSql + "), " +
        "base AS (SELECT d.doc_id, d.source, d.text, q.quality, pl.pred_lang " +
        "FROM documents d JOIN q USING (doc_id) JOIN pl USING (doc_id)) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens, " +
        "CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts, " +
        "round(1.0 - count(DISTINCT md5(text)) * 1.0 / count(*), 4) AS dup_rate, " +
        "round(avg(quality), 4) AS mean_quality, " +
        "round(sum(CASE WHEN pred_lang = 'en' THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS en_share, " +
        "CAST(sum(CASE WHEN len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+[a-z]')) " +
        "+ len(regexp_extract_all(text, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+')) " +
        "+ len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4}')) > 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS pii_docs FROM base GROUP BY source"),
    "q_l_diversity" ->
      ("WITH b AS (SELECT c_nationkey, c_mktsegment, " +
        "CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low' " +
        "ELSE 'high' END AS bal_band FROM customer) " +
        "SELECT c_nationkey, c_mktsegment, " +
        "count(DISTINCT bal_band) AS n_distinct_sensitive FROM b " +
        "GROUP BY 1, 2 HAVING count(DISTINCT bal_band) < 3"),
    // ordered-EMD replay on the same bounded (groups × bands) grid,
    // cumulated in band order so the doubles match bit-for-bit
    "q_t_closeness" ->
      ("WITH b AS (SELECT c_nationkey, c_mktsegment, " +
        "CAST(floor(c_acctbal / 2000) AS BIGINT) AS sv FROM customer), " +
        "vals AS (SELECT DISTINCT sv FROM b), " +
        "gq AS (SELECT sv, count(*) * 1.0 / (SELECT count(*) FROM b) AS q " +
        "FROM b GROUP BY sv), " +
        "grps AS (SELECT c_nationkey, c_mktsegment, count(*) AS n FROM b GROUP BY 1, 2), " +
        "cell AS (SELECT c_nationkey, c_mktsegment, sv, count(*) AS c FROM b GROUP BY 1, 2, 3), " +
        "grid AS (SELECT g.c_nationkey, g.c_mktsegment, g.n, v.sv, " +
        "coalesce(cell.c, 0) * 1.0 / g.n AS p, gq.q " +
        "FROM grps g CROSS JOIN vals v " +
        "LEFT JOIN cell ON cell.c_nationkey = g.c_nationkey " +
        "AND cell.c_mktsegment = g.c_mktsegment AND cell.sv = v.sv " +
        "JOIN gq ON gq.sv = v.sv), " +
        "cum AS (SELECT c_nationkey, c_mktsegment, n, " +
        "sum(p) OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY sv " +
        "ROWS UNBOUNDED PRECEDING) AS cp, " +
        "sum(q) OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY sv " +
        "ROWS UNBOUNDED PRECEDING) AS cq FROM grid) " +
        "SELECT c_nationkey, c_mktsegment, n AS n_rows, " +
        "round(sum(abs(cp - cq)) / ((SELECT count(*) FROM vals) - 1.0), 6) AS emd " +
        "FROM cum GROUP BY 1, 2, 3 " +
        "HAVING round(sum(abs(cp - cq)) / ((SELECT count(*) FROM vals) - 1.0), 6) > 0.2"),
  )
}
