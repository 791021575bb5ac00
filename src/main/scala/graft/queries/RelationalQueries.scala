package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.aggregate.FileAggregates
import graft.config.SuiteLoader
import graft.ext.{Bpe, Dedup, Events, LanguageModel, Multimodal, Packing, Retrieval, Sampling, Similarity, Stats, TextAnalysis}
import graft.ingest.{Metadata, Readers}
import graft.pipeline.{OdeSchema, Routing, ValidationPipeline}
import graft.plans.AsOf
import graft.rules.RuleCompiler
import graft.sequential.SequentialChecks
/** Relational engine surface (TPC-H-ish; Catalyst-optimized plans). Split out of the monolithic registry
  * (r9 verdict item 5); every member keeps resolving
  * unqualified through the `Queries.type` self-type. */
private[graft] trait RelationalQueries { this: Queries.type =>
  // =====================================================================
  // Relational engine surface (TPC-H-ish; Catalyst-optimized plans)
  // =====================================================================

  /** Headline aggregation (TPC-H Q1 shape; decimal sums for exactness). */
  private[graft] def q1Agg(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "lineitem"))
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // decimal sums internally for exactness; DOUBLE at the boundary so
        // the driver's parquet-vs-DuckDB value hash agrees (VERDICT r2 §wrong-1)
        sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 4))).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(18, 4)))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  private[graft] val q1AggOracle =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Multi-way broadcast join: revenue by region (dims broadcast). */
  private[graft] def joinRevenue(s: SparkSession, dir: String): DataFrame = {
    val orders = s.read.parquet(t(dir, "orders"))
    val customer = s.read.parquet(t(dir, "customer"))
    val nation = s.read.parquet(t(dir, "nation"))
    val region = s.read.parquet(t(dir, "region"))
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  private[graft] val joinRevenueOracle =
    """SELECT r_name,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** TPC-H Q3 (shipping priority): the classic selective fact-fact join
   *  — filtered lineitem ⋈ filtered orders on the order key with the
   *  BUILDING customer slice broadcast, top-10 orders by revenue.
   *  Revenue accumulates as DECIMAL(18,4) (order-free), the top-10 is a
   *  (revenue DESC, orderkey) total order planned as
   *  TakeOrderedAndProject — no global sort materializes. */
  private[graft] def tpchQ3Q(s: SparkSession, dir: String): DataFrame = {
    val cust = s.read.parquet(t(dir, "customer"))
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = s.read.parquet(t(dir, "orders"))
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = s.read.parquet(t(dir, "lineitem"))
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4)).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .select(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private[graft] val tpchQ3Oracle =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** ONE definition of the ASIA six-table star chain (region slice →
    * nation → customer/supplier dims all broadcast, lineitem ⋈ the
    * orders projection shuffling once on the order key, the co-nation
    * constraint riding the broadcast dims) — shared by q_tpch_q5 and
    * q_market_share, which must stay the same join or a chain retune
    * half-applies (r9 review; the hll-fragment lesson). Callers pass
    * their orders projection; rows carry (n_name, rev DECIMAL(18,4))
    * plus the orders columns. */
  private[graft] def asiaRevenueFrame(s: SparkSession, dir: String,
                               ord: DataFrame): DataFrame = {
    val nat = s.read.parquet(t(dir, "nation"))
      .join(broadcast(s.read.parquet(t(dir, "region"))
          .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = s.read.parquet(t(dir, "customer"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_nationkey").as("cn_key"),
        col("n_name"))
    val sup = s.read.parquet(t(dir, "supplier"))
      .select(col("s_suppkey"), col("s_nationkey"))
    s.read.parquet(t(dir, "lineitem"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4)).as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("cn_key"))
  }

  /** TPC-H Q5 (local supplier volume): the six-table star chain —
   *  region slice → nation → customer/supplier dims all broadcast, the
   *  lineitem ⋈ orders fact join shuffles once on the order key, and
   *  the co-nation constraint (c_nationkey = s_nationkey) rides the
   *  broadcast dims. Revenue per nation over one order year. */
  private[graft] def tpchQ5Q(s: SparkSession, dir: String): DataFrame =
    asiaRevenueFrame(s, dir,
      s.read.parquet(t(dir, "orders"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey")))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))

  private[graft] val tpchQ5Oracle =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue,
      |  count(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |  AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1""".stripMargin

  /** TPC-H Q18 (large-volume customers): the AGGREGATE-THEN-JOIN shape
   *  Q3/Q5 don't cover — the fact table reduces to per-order quantity
   *  sums FIRST, the HAVING filter keeps a tiny key set, and only then
   *  do orders/customer join (the filtered key set broadcasts back, so
   *  the big tables never join each other unfiltered). Top-100 under a
   *  total order as TakeOrderedAndProject. */
  private[graft] def tpchQ18Q(s: SparkSession, dir: String): DataFrame = {
    val bigOrders = s.read.parquet(t(dir, "lineitem"))
      .groupBy(col("l_orderkey"))
      // floor(): the one double→int both engines define identically
      .agg(sum(expr("CAST(floor(l_quantity) AS BIGINT)")).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    val ord = s.read.parquet(t(dir, "orders"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
    val cust = s.read.parquet(t(dir, "customer"))
      .select(col("c_custkey"), col("c_name"))
    ord.join(broadcast(bigOrders), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  private[graft] val tpchQ18Oracle =
    """WITH big AS (
      |  SELECT l_orderkey,
      |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      |  FROM lineitem GROUP BY 1 HAVING sum_qty > 250)
      |SELECT c_name, c_custkey, o_orderkey,
      |  CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, sum_qty
      |FROM orders
      |JOIN big ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Registers the five TPC-H tables as temp views so the decorrelation
    * queries below can be stated as literal correlated-subquery SQL —
    * the POINT of the family is that Catalyst (not hand-rewriting)
    * turns EXISTS / NOT EXISTS / correlated scalar aggregates into
    * joins; PlanSpec pins that no per-row re-execution survives. */
  private[graft] def tpchViews(s: SparkSession, dir: String): Unit =
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation")
      .foreach(n => s.read.parquet(t(dir, n)).createOrReplaceTempView(s"tpch_$n"))

  /** TPC-H Q17 shape (small-quantity-order revenue): the CORRELATED
    * SCALAR AGGREGATE family — the outer row compares against an
    * aggregate of its own part's lineitems. Stated as two correlated
    * scalar subqueries over the same inner table (count and sum), which
    * Catalyst decorrelates into aggregate-then-join (and may merge into
    * one shared aggregate). The classic `qty < 0.2 * avg(qty)` is
    * restated integer-exactly as `5 * qty * cnt < sum` so no
    * cross-engine division rounding exists (quantities are integral
    * doubles; floor() is the one double→int both engines define
    * identically). Adapted to the driver's schema (no p_container;
    * p_brand + p_type select the part slice). */
  private[graft] def tpchQ17Q(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql("""
      SELECT count(*) AS n_small,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7e0 AS avg_yearly
      FROM tpch_lineitem, tpch_part
      WHERE p_partkey = l_partkey
        AND p_brand = 'Brand#4'
        AND p_type = 'MEDIUM'
        AND CAST(floor(l_quantity) AS BIGINT) * 5 *
            (SELECT count(*) FROM tpch_lineitem l2 WHERE l2.l_partkey = p_partkey)
          < (SELECT sum(CAST(floor(l3.l_quantity) AS BIGINT))
             FROM tpch_lineitem l3 WHERE l3.l_partkey = p_partkey)""")
  }

  private[graft] val tpchQ17Oracle =
    """SELECT count(*) AS n_small,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7e0
      |    AS DOUBLE) AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND p_brand = 'Brand#4'
      |  AND p_type = 'MEDIUM'
      |  AND CAST(floor(l_quantity) AS BIGINT) * 5 *
      |      (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      |    < (SELECT sum(CAST(floor(l3.l_quantity) AS BIGINT))
      |       FROM lineitem l3 WHERE l3.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the MULTI-WAY
    * EXISTS / NOT-EXISTS family — three correlated references to the
    * SAME fact table. Catalyst rewrites the EXISTS into a left-semi and
    * the NOT EXISTS into a left-anti join on the order key; no per-row
    * re-execution survives (PlanSpec pins it). Adapted to the driver's
    * schema (no l_receiptdate/l_commitdate: `l_returnflag = 'R'` is the
    * "this supplier failed" marker — the supplier is the ONLY one in a
    * finished multi-supplier order whose lines came back returned).
    * Integer/string-only output: deterministic by construction. */
  private[graft] def tpchQ21Q(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql("""
      SELECT s_name, count(*) AS numwait
      FROM tpch_supplier, tpch_lineitem l1, tpch_orders, tpch_nation
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM tpch_lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM tpch_lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_returnflag = 'R')
        AND s_nationkey = n_nationkey
        AND n_name IN ('NATION_1','NATION_2','NATION_3')
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""")
  }

  private[graft] val tpchQ21Oracle =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |              WHERE l3.l_orderkey = l1.l_orderkey
      |                AND l3.l_suppkey <> l1.l_suppkey
      |                AND l3.l_returnflag = 'R')
      |  AND s_nationkey = n_nationkey
      |  AND n_name IN ('NATION_1','NATION_2','NATION_3')
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  /** TPC-H Q20 shape (excess-inventory suppliers): the NESTED SEMI-JOIN
    * CHAIN family — supplier IN (aggregated lineitem slice IN (part
    * slice)) with a correlated scalar sum gating the aggregate. The
    * derived-table-with-correlated-scalar form (share of a part's
    * all-time volume shipped by one supplier in the window, stated as
    * `shipped * 16 > total` in exact BIGINTs) is what Catalyst must
    * decorrelate twice: the scalar sum into aggregate-then-join, the
    * INs into left-semi joins. Adapted to the driver's schema (no
    * partsupp: lineitem plays the supplies-relation role). */
  private[graft] def tpchQ20Q(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql("""
      SELECT s_name, s_suppkey
      FROM tpch_supplier, tpch_nation
      WHERE s_suppkey IN (
        SELECT g.l_suppkey FROM (
          SELECT l_suppkey, l_partkey,
            sum(CAST(floor(l_quantity) AS BIGINT)) AS shipped
          FROM tpch_lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM tpch_part
                              WHERE p_name LIKE 'small%')
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY 1, 2) g
        WHERE g.shipped * 16 > (SELECT sum(CAST(floor(l4.l_quantity) AS BIGINT))
                                FROM tpch_lineitem l4
                                WHERE l4.l_partkey = g.l_partkey))
        AND s_nationkey = n_nationkey
        AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
      ORDER BY s_name""")
  }

  private[graft] val tpchQ20Oracle =
    """SELECT s_name, s_suppkey
      |FROM supplier, nation
      |WHERE s_suppkey IN (
      |  SELECT g.l_suppkey FROM (
      |    SELECT l_suppkey, l_partkey,
      |      sum(CAST(floor(l_quantity) AS BIGINT)) AS shipped
      |    FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part
      |                        WHERE p_name LIKE 'small%')
      |      AND l_shipdate >= TIMESTAMP '1996-01-01'
      |      AND l_shipdate < TIMESTAMP '1998-01-01'
      |    GROUP BY 1, 2) g
      |  WHERE g.shipped * 16 > (SELECT sum(CAST(floor(l4.l_quantity) AS BIGINT))
      |                          FROM lineitem l4
      |                          WHERE l4.l_partkey = g.l_partkey))
      |  AND s_nationkey = n_nationkey
      |  AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
      |ORDER BY s_name""".stripMargin

  /** TPC-H Q22 shape (global-customer sentiment): the UNCORRELATED
    * scalar subquery + anti-join family — the above-average-balance
    * cut is a one-time scalar (planned as a reusable subquery result,
    * never per-row), the no-high-value-orders condition a NOT EXISTS
    * anti-join. The classic `acctbal > avg(acctbal)` is restated
    * exactly as `bal·cnt > sum` over DECIMAL(18,2)/BIGINT (no
    * cross-engine division). Adapted to the driver's schema (no
    * c_phone: mktsegment plays the country-code role; every customer
    * has orders here, so the anti-join excludes HIGH-VALUE orders). */
  private[graft] def tpchQ22Q(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql("""
      SELECT c_mktsegment, count(*) AS numcust,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM tpch_customer c
      WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY')
        AND CAST(c_acctbal AS DECIMAL(18,2)) *
            (SELECT count(*) FROM tpch_customer c2 WHERE c2.c_acctbal > 0e0
               AND c2.c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY'))
          > (SELECT sum(CAST(c2.c_acctbal AS DECIMAL(18,2)))
             FROM tpch_customer c2 WHERE c2.c_acctbal > 0e0
               AND c2.c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY'))
        AND NOT EXISTS (SELECT 1 FROM tpch_orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 45e4)
      GROUP BY 1 ORDER BY 1""")
  }

  private[graft] val tpchQ22Oracle =
    """SELECT c_mktsegment, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY')
      |  AND CAST(c_acctbal AS DECIMAL(18,2)) *
      |      (SELECT count(*) FROM customer c2 WHERE c2.c_acctbal > 0e0
      |         AND c2.c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY'))
      |    > (SELECT sum(CAST(c2.c_acctbal AS DECIMAL(18,2)))
      |       FROM customer c2 WHERE c2.c_acctbal > 0e0
      |         AND c2.c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY'))
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 45e4)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q2 shape (minimum-cost supplier): the CORRELATED MIN
    * EQUALITY family — keep (part, supplier) rows whose min cost EQUALS
    * the part's global minimum, the argmin-by-join decorrelation.
    * Cost is integer-exact (`floor(l_extendedprice)` BIGINT — the one
    * double→int both engines define identically). Adapted to the
    * driver's schema (no partsupp: per-(part, supplier) lineitem
    * minima play the supplies-relation role). */
  private[graft] def tpchQ2Q(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql("""
      SELECT p_partkey, p_brand, s_name, mincost
      FROM (
        SELECT l_partkey, l_suppkey,
          min(CAST(floor(l_extendedprice) AS BIGINT)) AS mincost
        FROM tpch_lineitem GROUP BY 1, 2) ps
      JOIN tpch_part ON p_partkey = l_partkey
      JOIN tpch_supplier ON s_suppkey = l_suppkey
      WHERE p_brand = 'Brand#2' AND p_size < 10
        AND mincost = (SELECT min(CAST(floor(l2.l_extendedprice) AS BIGINT))
                       FROM tpch_lineitem l2
                       WHERE l2.l_partkey = ps.l_partkey)
      ORDER BY mincost, p_partkey, s_name LIMIT 100""")
  }

  private[graft] val tpchQ2Oracle =
    """SELECT p_partkey, p_brand, s_name, mincost
      |FROM (
      |  SELECT l_partkey, l_suppkey,
      |    min(CAST(floor(l_extendedprice) AS BIGINT)) AS mincost
      |  FROM lineitem GROUP BY 1, 2) ps
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |WHERE p_brand = 'Brand#2' AND p_size < 10
      |  AND mincost = (SELECT min(CAST(floor(l2.l_extendedprice) AS BIGINT))
      |                 FROM lineitem l2
      |                 WHERE l2.l_partkey = ps.l_partkey)
      |ORDER BY mincost, p_partkey, s_name LIMIT 100""".stripMargin

  /** TPC-H Q4 shape (order-priority checking): the EXISTS-with-
    * NON-EQUI-correlate family — the subquery's predicate references
    * the OUTER row's o_orderdate inside an inequality, so the rewrite
    * is a left-semi join whose condition mixes the equi key with the
    * cross-table comparison (l_shipdate > o_orderdate + 60 days plays
    * the reference's commit-vs-receipt lateness role; the driver's
    * lineitem has no commit/receipt dates). Output is priority counts:
    * integer-exact, deterministic by construction. */
  private[graft] def tpchQ4Q(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM tpch_orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND EXISTS (SELECT 1 FROM tpch_lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
      GROUP BY 1 ORDER BY 1""")
  }

  private[graft] val tpchQ4Oracle =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q7 shape (volume shipping): the SYMMETRIC NATION-PAIR
    * family — both ends of the fact row resolve to a nation (supplier
    * side directly, customer side through orders) and the filter is an
    * OR of the two orderings of the pair. The two nation lookups are
    * independent broadcast joins against the SAME dimension; the pair
    * disjunction can only be applied after both, so it rides the last
    * broadcast join rather than the scans. Revenue per (supp_nation,
    * cust_nation, year) with exact decimal sums. */
  private[graft] def tpchQ7Q(s: SparkSession, dir: String): DataFrame = {
    val nat = s.read.parquet(t(dir, "nation"))
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
    val sup = s.read.parquet(t(dir, "supplier"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = s.read.parquet(t(dir, "customer"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = s.read.parquet(t(dir, "orders"))
      .select(col("o_orderkey"), col("o_custkey"))
    s.read.parquet(t(dir, "lineitem"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4)).as("vol"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("vol")).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  private[graft] val tpchQ7Oracle =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(sum(vol) AS DOUBLE) AS revenue, count(*) AS n_rows
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INTEGER) AS l_year,
      |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS vol
      |  FROM lineitem
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01')
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    * lost to returns in a quarter — the HIGH-CARDINALITY GROUP-THEN-
    * TOP-K family. The group key is the customer (not a dim attribute),
    * so the aggregate shuffles on custkey and the total order is
    * resolved as TakeOrderedAndProject, never a global sort. Nation
    * resolves via broadcast AFTER the aggregate would be ideal, but the
    * key carries c_name/c_acctbal anyway, so it rides the pre-agg
    * broadcast — the aggregate stays the only exchange. */
  private[graft] def tpchQ10Q(s: SparkSession, dir: String): DataFrame = {
    val nat = s.read.parquet(t(dir, "nation"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = s.read.parquet(t(dir, "customer"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
    val ord = s.read.parquet(t(dir, "orders"))
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    s.read.parquet(t(dir, "lineitem"))
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4)).as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("revenue"), col("c_acctbal"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private[graft] val tpchQ10Oracle =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue,
      |  c_acctbal
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-07-01'
      |GROUP BY 1, 2, 3, c_acctbal
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q12 shape (priority classes per line status): the
    * CONDITIONAL-COUNT PIVOT family — one pass over the fact join,
    * two CASE-sums splitting the priority domain (the driver's
    * lineitem has no shipmode; l_linestatus plays the group role and
    * the 'N' returnflag slice plays the shipmode-IN filter). Integer
    * counts: deterministic by construction, map-side partial aggs. */
  private[graft] def tpchQ12Q(s: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val ord = s.read.parquet(t(dir, "orders"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    s.read.parquet(t(dir, "lineitem"))
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_returnflag") === "N")
      .select(col("l_orderkey"), col("l_linestatus"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
  }

  private[graft] val tpchQ12Oracle =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_returnflag = 'N'
      |GROUP BY 1""".stripMargin

  /** TPC-H Q14 (promotion effect): the GLOBAL-RATIO-OF-CONDITIONAL-
    * SUMS family — a single-row result whose numerator and denominator
    * are exact decimal sums over one month of the part join, divided
    * ONCE in double at the end (both engines replay the identical
    * 100.0*num/den op sequence; the sums themselves are order-free
    * decimals, so the ratio is bit-deterministic). */
  private[graft] def tpchQ14Q(s: SparkSession, dir: String): DataFrame = {
    val part = s.read.parquet(t(dir, "part"))
      .select(col("p_partkey"), col("p_type"))
    val dec0 = lit(BigDecimal(0).bigDecimal).cast(DecimalType(18, 4))
    s.read.parquet(t(dir, "lineitem"))
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select(col("l_partkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4)).as("rev"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", col("rev"))
            .otherwise(dec0)).cast("double") /
          sum(col("rev")).cast("double")).as("promo_revenue_pct"),
        count(lit(1)).as("n_rows"))
  }

  private[graft] val tpchQ14Oracle =
    """SELECT CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
      |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |        AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE) AS promo_revenue_pct,
      |  count(*) AS n_rows
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin

  /** TPC-H Q19 shape (discounted revenue): the DISJUNCTIVE OR-OF-ANDS
    * join-predicate family — three (brand, size-range, quantity-range)
    * conjunct groups OR'd together across the lineitem ⋈ part join.
    * The planner-relevant behavior: Catalyst extracts the common
    * p_partkey = l_partkey equi-conjunct so the join stays a hash join
    * (never a nested-loop), and pushes the union of each side's
    * disjuncts (brand/size to the part scan, quantity to the lineitem
    * scan) as data-skipping filters; the full disjunction re-applies
    * as the join's residual condition. */
  private[graft] def tpchQ19Q(s: SparkSession, dir: String): DataFrame = {
    val part = s.read.parquet(t(dir, "part"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val li = s.read.parquet(t(dir, "lineitem"))
      .select(col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4)).as("rev"))
    def arm(brand: String, sizeHi: Int, qLo: Int, qHi: Int): Column =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity") >= qLo && col("l_quantity") <= qHi
    li.join(broadcast(part), col("l_partkey") === col("p_partkey") &&
        (arm("Brand#12", 5, 1, 11) || arm("Brand#23", 10, 10, 20) ||
          arm("Brand#34", 15, 20, 30)))
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  private[graft] val tpchQ19Oracle =
    """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |    AND l_quantity >= 1 AND l_quantity <= 11)
      |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |    AND l_quantity >= 10 AND l_quantity <= 20)
      |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin

  /** TPC-H Q6 (forecasting revenue change): the PURE-PUSHDOWN single-
    * table aggregate — three range predicates, zero joins, one scan.
    * The planner-relevant behavior is that ALL THREE filters reach the
    * parquet scan (PlanSpec pins `PushedFilters`) and the aggregate is
    * one partial+final pair over the pruned 3-column read. Exact
    * decimal sum of the price·discount products. */
  private[graft] def tpchQ6Q(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "lineitem"))
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  private[graft] val tpchQ6Oracle =
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q13 (customer distribution): the AGGREGATE-OF-AGGREGATE
    * family — a left outer join whose FILTER RIDES THE JOIN CONDITION
    * (not the WHERE clause: customers with zero qualifying orders must
    * survive with count 0), a per-customer count, then the histogram
    * of those counts. Two hash aggregates on different keys; integer
    * output, deterministic by construction. The priority slice stands
    * in for the reference's comment NOT LIKE filter (no o_comment in
    * the driver's schema). */
  private[graft] def tpchQ13Q(s: SparkSession, dir: String): DataFrame = {
    val cust = s.read.parquet(t(dir, "customer")).select(col("c_custkey"))
    val ord = s.read.parquet(t(dir, "orders"))
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_custkey"), col("o_orderkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private[graft] val tpchQ13Oracle =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q8 (national market share): the CASE-SHARE-OVER-WIDE-JOIN
    * family — a seven-table join (lineitem at the center; part slice,
    * supplier→nation, customer→nation→region all broadcast; orders the
    * only co-shuffled side) feeding ONE aggregate whose numerator is a
    * CASE-gated decimal sum and whose denominator is the plain sum, so
    * the share is a single double division of two order-free decimals
    * per year. The planner point: no OR-expansion, no second pass —
    * both sums ride one partial+final aggregate pair over the join.
    *
    * Broadcast posture (ADVICE r11): only the FIXED-cardinality frames
    * (nation, nation⨝region) carry explicit broadcast hints. The
    * SF-scaling slices — part, customer, supplier — are left to
    * autoBroadcastJoinThreshold: Spark honors an explicit hint
    * regardless of size, so hinting them would OOM the driver at
    * 100 TB instead of degrading gracefully to a shuffle join; at the
    * gate SFs they sit far under the threshold and still broadcast
    * (PlanSpec pins the 7-broadcast shape there). */
  private[graft] def tpchQ8Q(s: SparkSession, dir: String): DataFrame = {
    val part = s.read.parquet(t(dir, "part"))
      .filter(col("p_type") === "STANDARD").select(col("p_partkey"))
    val natRegion = s.read.parquet(t(dir, "nation"))
      .join(broadcast(s.read.parquet(t(dir, "region"))
          .filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = s.read.parquet(t(dir, "customer"))
      .join(broadcast(natRegion), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val sup = s.read.parquet(t(dir, "supplier"))
      .join(broadcast(s.read.parquet(t(dir, "nation"))
          .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val ord = s.read.parquet(t(dir, "orders"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val dec0 = lit(BigDecimal(0).bigDecimal).cast(DecimalType(18, 4))
    s.read.parquet(t(dir, "lineitem"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4)).as("vol"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_5", col("vol"))
            .otherwise(dec0)).cast("double") /
          sum(col("vol")).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_rows"))
  }

  private[graft] val tpchQ8Oracle =
    """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
      |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
      |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |        AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE) AS mkt_share,
      |  count(*) AS n_rows
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey AND p_type = 'STANDARD'
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1""".stripMargin

  /** TPC-H Q9 (product-type profit): the LIKE-FILTERED MULTI-WAY JOIN
    * family — every lineitem resolves through FOUR dimensions (part by
    * infix LIKE, supplier, supplier nation, order year), profit per
    * (nation, year). Adapted to the driver's schema (no partsupp:
    * p_retailprice plays ps_supplycost's role, so profit =
    * extprice·(1−disc) − retailprice·qty, cast to DECIMAL(18,4) for an
    * order-free sum — both engines run the identical IEEE double ops
    * before the one cast). The planner point: the LIKE prunes part
    * FIRST (pushed as StringContains), the pruned part broadcast-gates
    * lineitem before the orders shuffle, and the join order never pairs
    * two fact tables unfiltered. */
  private[graft] def tpchQ9Q(s: SparkSession, dir: String): DataFrame = {
    val part = s.read.parquet(t(dir, "part"))
      .filter(col("p_name").contains("bolt"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sup = s.read.parquet(t(dir, "supplier"))
      .join(broadcast(s.read.parquet(t(dir, "nation"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val ord = s.read.parquet(t(dir, "orders"))
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    s.read.parquet(t(dir, "lineitem"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"), col("l_quantity"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity"))
          .cast(DecimalType(18, 4)).as("amount"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("amount")).cast("double").as("sum_profit"),
        count(lit(1)).as("n_rows"))
  }

  private[graft] val tpchQ9Oracle =
    """SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |      - p_retailprice * l_quantity AS DECIMAL(18,4)))
      |    AS DOUBLE) AS sum_profit,
      |  count(*) AS n_rows
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%bolt%'
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |GROUP BY 1, 2""".stripMargin

  /** TPC-H Q11 shape (important stock): the GROUP-AGGREGATE-VS-GLOBAL-
    * SCALAR family — per-part value sums filtered against a multiple of
    * the GLOBAL MEAN part value, stated so both threshold terms are
    * uncorrelated scalar subqueries Catalyst plans ONCE each (broadcast
    * scalars, never per-row; PlanSpec pins exactly two subquery nodes
    * and runtime exchange reuse). Value is integer-exact (floor·floor
    * BIGINT products — the one double→int both engines define
    * identically) and the mean comparison is cross-multiplied
    * (`value·count > 2·total`), so no cross-engine division exists —
    * and unlike TPC-H's fixed `0.0001/SF` fraction, the above-2×-mean
    * cut keeps the result NON-EMPTY at every scale factor (a fixed
    * fraction goes vacuous as the part count grows — the r11 review
    * caught the sf0.1 gate passing on 0 rows). Adapted to the driver's
    * schema (no partsupp: the nation-sliced suppliers' lineitems play
    * the stock rows). */
  private[graft] def tpchQ11Q(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql("""
      WITH v AS (
        SELECT l_partkey,
          sum(CAST(floor(l_extendedprice) AS BIGINT) *
              CAST(floor(l_quantity) AS BIGINT)) AS pvalue
        FROM tpch_lineitem
        WHERE l_suppkey IN (
          SELECT s_suppkey FROM tpch_supplier
          JOIN tpch_nation ON s_nationkey = n_nationkey
          WHERE n_name IN ('NATION_1','NATION_2','NATION_3',
                           'NATION_4','NATION_5'))
        GROUP BY 1)
      SELECT l_partkey, pvalue FROM v
      WHERE pvalue * (SELECT count(*) FROM v)
          > 2 * (SELECT sum(pvalue) FROM v)""")
  }

  private[graft] val tpchQ11Oracle =
    """WITH v AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(floor(l_extendedprice) AS BIGINT) *
      |        CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS pvalue
      |  FROM lineitem
      |  WHERE l_suppkey IN (
      |    SELECT s_suppkey FROM supplier
      |    JOIN nation ON s_nationkey = n_nationkey
      |    WHERE n_name IN ('NATION_1','NATION_2','NATION_3',
      |                     'NATION_4','NATION_5'))
      |  GROUP BY 1)
      |SELECT l_partkey, pvalue FROM v
      |WHERE pvalue * (SELECT count(*) FROM v)
      |    > 2 * (SELECT sum(pvalue) FROM v)""".stripMargin

  /** TPC-H Q15 (top supplier): the MAX-OVER-AGGREGATE-VIEW family —
    * the revenue view (per-supplier quarter totals) is compared against
    * its OWN maximum with EQUALITY, so ties all surface (the spec's
    * point; at this data one supplier holds the max, but the plan is
    * tie-correct by construction). Revenue is integer-exact
    * (floor(extprice·(1−disc)) BIGINT — identical IEEE product then the
    * one shared double→int). The 1-row max broadcast-joins back; the
    * view's groupBy is the only exchange and AQE reuses it for the max
    * side rather than recomputing the scan. */
  private[graft] def tpchQ15Q(s: SparkSession, dir: String): DataFrame = {
    val rev = s.read.parquet(t(dir, "lineitem"))
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp") &&
        // stated here (not left to the join's implicit constraint) so the
        // max side's subtree canonicalizes EQUAL to the main side's and
        // AQE's ReuseExchange runs the view once, not twice
        col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey"))
      .agg(sum(expr(
        "CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT)"))
        .as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("mx"))
    val sup = s.read.parquet(t(dir, "supplier"))
      .select(col("s_suppkey"), col("s_name"))
    rev.join(broadcast(mx), col("total_rev") === col("mx"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
  }

  private[graft] val tpchQ15Oracle =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount))
      |      AS BIGINT)) AS BIGINT) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_rev
      |FROM rev JOIN supplier ON s_suppkey = l_suppkey
      |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin

  /** TPC-H Q16 shape (parts/supplier relationship): the DISTINCT-COUNT
    * + NOT-IN family — supplier counts per (brand, type, size) bucket
    * with an excluded-supplier NOT IN that Catalyst must turn into a
    * null-aware anti join (never a per-row scan). Adapted to the
    * driver's schema (no partsupp: lineitem's (partkey, suppkey) pairs
    * play the supplies relation — count(DISTINCT) absorbs the pair
    * multiplicity; negative-balance suppliers play the complaints
    * slice). Integer/string output: deterministic by construction. */
  private[graft] def tpchQ16Q(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql("""
      SELECT p_brand, p_type, p_size,
        count(DISTINCT l_suppkey) AS supplier_cnt
      FROM tpch_lineitem JOIN tpch_part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#5'
        AND p_type <> 'PROMO'
        AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM tpch_supplier
                              WHERE s_acctbal < 0e0)
      GROUP BY 1, 2, 3""")
  }

  private[graft] val tpchQ16Oracle =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#5'
      |  AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0e0)
      |GROUP BY 1, 2, 3""".stripMargin

  /** Semi/anti joins: customers with vs without orders per segment. */
  private[graft] def semiAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val customer = s.read.parquet(t(dir, "customer"))
    val orders = s.read.parquet(t(dir, "orders")).select(col("o_custkey"))
    val withO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("with_orders"))
    val withoutO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("without_orders"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"))
  }

  private[graft] val semiAntiJoinOracle =
    """SELECT c_mktsegment,
      |  CAST(count(*) FILTER (WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS BIGINT) AS with_orders,
      |  CAST(count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS BIGINT) AS without_orders
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  /** O2 top-k: TakeOrderedAndProject plan. */
  private[graft] def topkOrders(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "orders"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)
      .select(col("o_orderkey"), col("o_totalprice"))

  private[graft] val topkOrdersOracle =
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15"

  /** W8: ranking + lag analytics per user. */
  private[graft] def windowRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    events(s, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("user_id"), col("event_id"), col("rnk"))
  }

  private[graft] val windowRankOracle =
    """SELECT user_id, event_id, CAST(rnk AS INT) AS rnk FROM (
      |  SELECT user_id, event_id,
      |         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
      |  FROM events) WHERE rnk <= 3""".stripMargin

  /** Distribution-rank window surface (percent_rank / cume_dist /
   *  ntile) — the W8 family members the rank trio doesn't cover, over
   *  customer balances per market segment. The order is made TOTAL
   *  (acctbal, custkey) so ntile's row assignment is deterministic;
   *  percent_rank and cume_dist are single integer-ratio divisions both
   *  engines define identically. */
  private[graft] def windowDistributionQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    s.read.parquet(t(dir, "customer"))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        ntile(4).over(w).as("quartile"))
  }

  private[graft] val windowDistributionOracle =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume,
      |  CAST(ntile(4) OVER w AS INT) AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment
      |  ORDER BY c_acctbal, c_custkey)""".stripMargin

  /** Compaction planning — the small-files audit a 100 TB table runs
   *  BEFORE rewriting: per (event_type, day) "partition" sizes (props
   *  payload + fixed row overhead, an integer proxy for parquet bytes)
   *  packed greedily in day order into ~target-size output buckets by
   *  cumulative-sum division. Everything is one keyed aggregate + one
   *  per-type window cumsum over day-bounded rows; bucket assignment is
   *  integer floor division, so the plan is deterministic and
   *  recomputable on any engine. */
  private[graft] def compactionPlanQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000000000L
    val target = 16384L // 16 KiB buckets ≈ 3-4 day-partitions at this sf
    val parts = events(s, dir)
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"),
        (length(col("props")).cast("long") + lit(64L)).as("rb"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("rb")).as("bytes"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("bucket", expr(s"(cum - bytes) div $target"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_partitions"), sum(col("bytes")).as("bytes"),
        min(col("day")).as("day_from"), max(col("day")).as("day_to"))
  }

  private[graft] val compactionPlanOracle =
    """WITH p AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
      |    CAST(sum(length(props) + 64) AS BIGINT) AS bytes
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, day, bytes,
      |    CAST(sum(bytes) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM p)
      |SELECT event_type, (cum - bytes) // 16384 AS bucket,
      |  count(*) AS n_partitions, CAST(sum(bytes) AS BIGINT) AS bytes,
      |  min(day) AS day_from, max(day) AS day_to
      |FROM c GROUP BY 1, 2""".stripMargin

  /** Pre-join cardinality estimation — the planner-side safety check a
   *  100 TB self-join runs FIRST: exact |⋈| on the l_partkey key
   *  (Σ c(k)² from the per-key counts — no join ever materializes) next
   *  to the heavy-hitter estimate a stats collector would hold (top-20
   *  keys exact + uniform-rest square), with the relative error of the
   *  estimate. One keyed aggregate; the top-20 is TakeOrdered-bounded. */
  private[graft] def joinSizeEstimateQ(s: SparkSession, dir: String): DataFrame = {
    val counts = s.read.parquet(t(dir, "lineitem"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // feeds exact, top-k, and the remainder agg
    val exact = counts.agg(sum(col("c") * col("c")).as("exact_pairs"),
      sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"))
    val topk = counts
      .orderBy(col("c").desc, col("l_partkey")).limit(20)
      .agg(sum(col("c") * col("c")).as("top_sq"), sum(col("c")).as("top_n"),
        count(lit(1)).as("top_k"))
    exact.crossJoin(broadcast(topk))
      .withColumn("rest_n", col("n_rows") - col("top_n"))
      .withColumn("rest_k", col("n_keys") - col("top_k"))
      .withColumn("est_pairs",
        col("top_sq").cast("double") +
          when(col("rest_k") > 0,
            col("rest_n").cast("double") * col("rest_n") / col("rest_k"))
            .otherwise(lit(0e0)))
      .select(col("n_rows"), col("n_keys"), col("exact_pairs"),
        round(col("est_pairs"), 1).as("est_pairs"),
        round((col("est_pairs") - col("exact_pairs").cast("double")) /
          col("exact_pairs"), 6).as("rel_error"))
  }

  private[graft] val joinSizeEstimateOracle =
    """WITH c AS (
      |  SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1),
      |e AS (
      |  SELECT CAST(sum(c * c) AS BIGINT) AS exact_pairs,
      |    CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys
      |  FROM c),
      |t AS (
      |  SELECT CAST(sum(c * c) AS BIGINT) AS top_sq,
      |    CAST(sum(c) AS BIGINT) AS top_n, count(*) AS top_k
      |  FROM (SELECT c FROM c ORDER BY c DESC, l_partkey LIMIT 20)),
      |j AS (
      |  SELECT *, n_rows - top_n AS rest_n, n_keys - top_k AS rest_k
      |  FROM e, t),
      |est AS (
      |  SELECT *,
      |    CAST(top_sq AS DOUBLE) + CASE WHEN rest_k > 0
      |      THEN CAST(rest_n AS DOUBLE) * rest_n / rest_k
      |      ELSE 0e0 END AS est_raw
      |  FROM j)
      |SELECT n_rows, n_keys, exact_pairs,
      |  round(est_raw, 1) AS est_pairs,
      |  round((est_raw - CAST(exact_pairs AS DOUBLE)) / exact_pairs, 6)
      |    AS rel_error
      |FROM est""".stripMargin

  /** W8 widening: RANGE-frame window — per-user rolling 1-hour value
   *  sum over event time (`ts` long nanos orders the frame), the
   *  time-based frame the ROWS-frame family can't express. */
  private[graft] def rollingWindowQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourNs = 3600L * 1000000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-hourNs, Window.currentRow)
    events(s, dir)
      .withColumn("rolling_1h_value", round(sum(col("value")).over(w), 6))
      .select(col("event_id"), col("user_id"), col("rolling_1h_value"))
  }

  private[graft] val rollingWindowOracle =
    """SELECT event_id, user_id,
      |  round(sum(value) OVER (
      |    PARTITION BY user_id ORDER BY epoch_ns(ts)
      |    RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW), 6)
      |    AS rolling_1h_value
      |FROM events""".stripMargin

  /** A7 widening: explicit GROUPING SETS with grouping_id — the
   *  rollup/cube generalization (per-lang, per-source, and grand-total
   *  slices in one pass, NOT the full cube). */
  private[graft] def groupingSetsQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    d.createOrReplaceTempView("graft_docs_gs")
    s.sql("""SELECT lang, source, count(*) AS n_docs,
            |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
            |  CAST(grouping_id(lang, source) AS BIGINT) AS gid
            |FROM graft_docs_gs
            |GROUP BY GROUPING SETS ((lang), (source), ())""".stripMargin)
  }

  private[graft] val groupingSetsOracle =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(grouping_id(lang, source) AS BIGINT) AS gid
      |FROM documents
      |GROUP BY GROUPING SETS ((lang), (source), ())""".stripMargin

  /** Pivot: event-type value sums pivoted to columns per user decade —
   *  Spark's relational pivot against a CASE-aggregation oracle. */
  private[graft] def pivotQ(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("user_decade", expr("user_id div 10"))
      .groupBy(col("user_decade"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(round(sum(col("value")), 6))

  private[graft] val pivotOracle =
    """SELECT user_id // 10 AS user_decade,
      |  round(sum(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
      |  round(sum(CASE WHEN event_type = 'view' THEN value END), 6) AS view,
      |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
      |  round(sum(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup,
      |  round(sum(CASE WHEN event_type = 'error' THEN value END), 6) AS error
      |FROM events GROUP BY 1""".stripMargin

  /** Time-series gap filling: the hourly calendar spine × event types,
   *  missing buckets zero-filled and forward-filled with the last seen
   *  hourly sum — the dashboarding op plain GROUP BY can't produce
   *  (absent hours simply don't exist in the grouped output). */
  private[graft] def gapFillQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourNs = 3600L * 1000000000L
    val hourly = events(s, dir)
      .withColumn("hour", expr(s"ts div $hourNs"))
      .groupBy(col("hour"), col("event_type"))
      .agg(round(sum(col("value")), 6).as("hour_value"))
    val bounds = hourly.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("hour"))
      .crossJoin(hourly.select(col("event_type")).distinct())
    val filled = spine.join(hourly, Seq("hour", "event_type"), "left")
    val wFill = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled
      .withColumn("value_zero_filled", coalesce(col("hour_value"), lit(0.0)))
      .withColumn("value_forward_filled",
        coalesce(last(col("hour_value"), ignoreNulls = true).over(wFill), lit(0.0)))
      .withColumn("is_gap", col("hour_value").isNull)
      .select(col("hour"), col("event_type"), col("value_zero_filled"),
        col("value_forward_filled"), col("is_gap"))
  }

  private[graft] val gapFillOracle =
    """WITH h AS (
      |  SELECT epoch_ns(ts) // 3600000000000 AS hour, event_type,
      |    round(sum(value), 6) AS hour_value
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM h),
      |spine AS (
      |  SELECT unnest(generate_series(lo, hi)) AS hour FROM b),
      |grid AS (
      |  SELECT s.hour, t.event_type
      |  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM h) t),
      |j AS (
      |  SELECT g.hour, g.event_type, h.hour_value
      |  FROM grid g LEFT JOIN h ON g.hour = h.hour AND g.event_type = h.event_type)
      |SELECT hour, event_type,
      |  coalesce(hour_value, CAST(0.0 AS DOUBLE)) AS value_zero_filled,
      |  coalesce(last_value(hour_value IGNORE NULLS) OVER (
      |    PARTITION BY event_type ORDER BY hour
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), CAST(0.0 AS DOUBLE))
      |    AS value_forward_filled,
      |  hour_value IS NULL AS is_gap
      |FROM j""".stripMargin

  /** Rate-anomaly detection: hourly event counts on the DENSE spine
   *  (gaps are real zero observations — a sparse GROUP BY would hide
   *  exactly the outage hours this op exists to catch), z-scored
   *  against the trailing 24 CLOSED hours; |z| > 3 flags spikes and
   *  outages. Variance = avg(x²) − avg(x)², identical both engines. */
  private[graft] def rateAnomalyQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourNs = 3600L * 1000000000L
    val hourly = events(s, dir)
      .withColumn("hour", expr(s"ts div $hourNs"))
      .groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val bounds = hourly.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("hour"))
      .crossJoin(hourly.select(col("event_type")).distinct())
    val dense = spine.join(hourly, Seq("hour", "event_type"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val trail = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    dense
      .withColumn("mu", avg(col("n")).over(trail))
      .withColumn("var", avg(col("n") * col("n")).over(trail) - col("mu") * col("mu"))
      .withColumn("z", when(col("var") > 0,
        (col("n").cast("double") - col("mu")) / sqrt(col("var"))).otherwise(lit(0.0)))
      .filter(col("mu").isNotNull) // first hour has no trailing window
      .select(col("hour"), col("event_type"), col("n"),
        round(col("mu"), 6).as("mean_24h"), round(col("z"), 6).as("z"),
        (abs(col("z")) > 3.0).as("is_anomaly"))
  }

  private[graft] val rateAnomalyOracle =
    """WITH h AS (
      |  SELECT epoch_ns(ts) // 3600000000000 AS hour, event_type,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM h),
      |spine AS (SELECT unnest(generate_series(lo, hi)) AS hour FROM b),
      |grid AS (
      |  SELECT s.hour, t.event_type
      |  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM h) t),
      |d AS (
      |  SELECT g.hour, g.event_type, coalesce(h.n, 0) AS n
      |  FROM grid g LEFT JOIN h ON g.hour = h.hour AND g.event_type = h.event_type),
      |w AS (
      |  SELECT hour, event_type, n,
      |    avg(n) OVER (PARTITION BY event_type ORDER BY hour
      |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS mu,
      |    avg(n * n) OVER (PARTITION BY event_type ORDER BY hour
      |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
      |    - avg(n) OVER (PARTITION BY event_type ORDER BY hour
      |        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
      |      * avg(n) OVER (PARTITION BY event_type ORDER BY hour
      |          ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS var
      |  FROM d),
      |z AS (
      |  SELECT hour, event_type, n, mu,
      |    CASE WHEN var > 0 THEN (n - mu) / sqrt(var) ELSE CAST(0.0 AS DOUBLE) END AS z
      |  FROM w WHERE mu IS NOT NULL)
      |SELECT hour, event_type, n, round(mu, 6) AS mean_24h,
      |  round(z, 6) AS z, abs(z) > CAST(3.0 AS DOUBLE) AS is_anomaly
      |FROM z""".stripMargin

  /** A7 rollup: customer counts by region/nation with subtotals. */
  private[graft] def rollupCounts(s: SparkSession, dir: String): DataFrame = {
    val customer = s.read.parquet(t(dir, "customer"))
    val nation = s.read.parquet(t(dir, "nation"))
    val region = s.read.parquet(t(dir, "region"))
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
  }

  private[graft] val rollupCountsOracle =
    """SELECT r_name, n_name, count(*) AS n_customers
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** Non-equi range join: orders matched to the events window that
   *  follows them (theta join surface; small side broadcast → BNL). */
  private[graft] def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val tsCol = timestamp_micros(expr("ts div 1000"))
    val ev = events(s, dir)
      .select(col("event_id"), col("user_id"), tsCol.as("ets"))
      .filter(col("event_id") < 500)
    val usr = s.read.parquet(t(dir, "customer"))
      .select(col("c_custkey"), col("c_acctbal")).filter(col("c_custkey") < 50)
    ev.join(broadcast(usr),
        col("user_id") >= col("c_custkey") && col("user_id") < col("c_custkey") + 5)
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_events"), max(col("event_id")).as("max_event"))
  }

  private[graft] val rangeJoinOracle =
    """SELECT c_custkey, count(*) AS n_events, max(event_id) AS max_event
      |FROM (SELECT event_id, user_id FROM events WHERE event_id < 500) e
      |JOIN (SELECT c_custkey FROM customer WHERE c_custkey < 50) c
      |  ON e.user_id >= c.c_custkey AND e.user_id < c.c_custkey + 5
      |GROUP BY c_custkey""".stripMargin

  /** As-of (point-in-time) join: for each purchase event, the latest view
   *  event by the same user at-or-before it. Runs through the custom
   *  [[graft.plans.AsOfJoin]] LogicalPlan, lowered to Union+Window — ONE
   *  shuffle of n_left+n_right rows instead of the quadratic
   *  pair-materializing range join. `ts` is long nanos (nanosAsLong);
   *  output at µs (`div 1000`, integer-exact) because DuckDB truncates
   *  nanos parquet timestamps to µs on read. */
  private[graft] def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        expr("ts div 1000").as("purchase_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        expr("ts div 1000").as("view_ts"))
    AsOf.joinAsOf(purchases, views, "purchase_ts", "view_ts",
        Seq("user_id" -> "v_user"), tieBreak = Some("view_id"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"))
  }

  private[graft] val asofJoinOracle =
    """SELECT p.user_id, p.event_id AS purchase_id, epoch_us(p.ts) AS purchase_ts,
      |       v.event_id AS view_id, epoch_us(v.ts) AS view_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin

  /** Partitioned table layout + partition-pruned scan: events written
   *  `partitionBy(event_type)`, read back filtered to ONE type — the
   *  filter eliminates whole directories before any IO (PlanSpec pins
   *  `PartitionFilters` on the scan). At 100 TB this is the difference
   *  between scanning one partition and scanning the lake; same mechanism
   *  as Hive-style `state=`/`type=` layouts the reference routes on. */
  private[graft] def partitionedScan(s: SparkSession, dir: String): DataFrame = {
    // fixed path + overwrite: a fresh temp dir per invocation would leak
    // a full copy of events on every Verify/Bench/PlanSpec run. The
    // (deliberate) cost of writing the layout stays inside this query's
    // own timing, like q_bucketed_join's table build.
    val out = s"target/tmp/graft-partitioned-${new java.io.File(dir).getName}"
    events(s, dir)
      .write.partitionBy("event_type").mode("overwrite").parquet(out)
    s.read.parquet(out)
      .filter(col("event_type") === "click")
      .groupBy(to_date(timestamp_micros(expr("ts div 1000"))).as("day"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
  }

  private[graft] val partitionedScanOracle =
    """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |  count(*) AS n_events, sum(value) AS total_value
      |FROM events WHERE event_type = 'click' GROUP BY 1""".stripMargin

  /** Approximate aggregation — the sketches that replace exact
   *  count-distinct / percentiles at 100 TB: HLL++ (`approx_count_distinct`,
   *  relative error ~rsd) and the quantile sketch (`percentile_approx`,
   *  rank error ≤ 1/accuracy). Both are one map-side-combined pass with a
   *  CONSTANT-size aggregation buffer per group — where exact distinct
   *  shuffles every key and exact percentile sorts the group. Rows-only
   *  (DuckDB's approx sketches differ by construction); ApproxAggSpec
   *  pins the relative error against the exact aggregates. */
  private[graft] def approxAgg(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "lineitem"))
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_suppkey")).as("approx_supps"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median_price"))

  /** Value-oracled md5-family twin of the q_approx_agg sketch
   *  MECHANISMS (r8 VERDICT item 4 — the production query stays
   *  rows-only because Spark's HLL++ bias table and KLL buffers have no
   *  DuckDB mirror; this twin pins the register/estimator algebra at
   *  full value equality instead):
   *
   *  - HLL register build + harmonic estimate, from scratch: 60-bit
   *    hash from 15 md5 hex chars (the portable md5 idiom), m = 64
   *    registers (6-bit bucket, 54-bit word), rho = leading zeros + 1.
   *    The harmonic sum Σ2^(−M_j) is computed EXACTLY as the integer
   *    Σ2^(55−M_j) (≤ 64·2^55 < 2^63 — no float accumulation, so
   *    partial-agg order can't move a ulp), and only the final
   *    alpha·m²·2^55/sum runs in doubles with the identical op sequence
   *    in both engines. Raw estimator by design — m is chosen so the
   *    testdata cardinality sits in the no-correction regime, keeping
   *    the twin free of cross-engine `ln` (not correctly rounded in
   *    IEEE, unlike +,·,/,sqrt).
   *  - Deterministic sampled median: a fixed-rate md5-uniform row
   *    sample (u32 < 2^32/16) and the type-1 sample median by integer
   *    rank comparison (2·cum ≥ n picks an actual DECIMAL data value —
   *    no interpolation to diverge).
   */
  /** Shared md5-HLL fragments — ONE definition of m, the 6/54-bit hash
    * split, the rho expression, and the estimator, used by BOTH sketch
    * queries (q_approx_agg_md5, q_hll_merge_daily) and interpolated
    * into their oracles so a retune can't half-apply (the kmvK lesson).
    * 2^54 splits the 60-bit hash; 2^55 scales the exact integer
    * harmonic sum; absent buckets carry 2^55 each. */
  private[graft] val hllM = 64
  private[graft] val hllSplit = "18014398509481984" // 2^54
  private[graft] val hllScale = "36028797018963968" // 2^55
  private[graft] val hllRhoSql =
    s"CASE WHEN h % $hllSplit = 0 THEN 55 ELSE 55 - length(bin(h % $hllSplit)) END"
  private[graft] def hllEstSql(sumCol: String): String =
    s"(7213e-4 / (1e0 + 1079e-3 / ${hllM}e0)) * ${hllM}e0 * ${hllM}e0 * " +
      s"${hllScale}e0 / $sumCol"

  private[graft] def approxAggMd5Q(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = s.read.parquet(t(dir, "lineitem"))
      .select(col("l_returnflag"), col("l_partkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))
    // ---- HLL over l_partkey: exact integer register sums per flag
    val hashed = li.select(col("l_returnflag"),
      expr("graft_md5_prefix_long(CAST(l_partkey AS STRING), 15)").as("h"))
    val regs = hashed
      .select(col("l_returnflag"),
        expr(s"h div $hllSplit").as("bucket"),
        expr(s"CAST($hllRhoSql AS BIGINT)").as("rho"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(max(col("rho")).as("m"))
    val hll = regs.groupBy(col("l_returnflag"))
      .agg(expr("sum(CAST(pow(2e0, 55 - m) AS BIGINT))").as("sum_present"),
        count(lit(1)).as("n_buckets"))
      .select(col("l_returnflag"),
        (col("sum_present") +
          (lit(hllM.toLong) - col("n_buckets")) * lit(hllScale.toLong))
          .as("sum_scaled"))
      .select(col("l_returnflag"),
        round(expr(hllEstSql("sum_scaled")), 2).as("hll_parts_est"))
    // ---- deterministic sampled median of l_extendedprice per flag
    val sampled = li
      .filter(expr("graft_md5_prefix_long(concat_ws('|', l_orderkey," +
        " l_linenumber), 8) < 268435456"))
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))
    val wv = Window.partitionBy(col("l_returnflag")).orderBy(col("v"))
    val med = sampled
      .groupBy(col("l_returnflag"), col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(col("l_returnflag"))))
      .groupBy(col("l_returnflag"))
      .agg(min(when(col("cum") * 2 >= col("n"), col("v")))
          .cast("double").as("sample_median_price"),
        first(col("n")).as("sample_n"))
      .select(col("l_returnflag"), col("sample_n"),
        col("sample_median_price"))
    hll.join(med, Seq("l_returnflag"))
  }

  private[graft] val approxAggMd5Oracle =
    s"""WITH h AS (
      |  SELECT l_returnflag,
      |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT
      |      AS h
      |  FROM lineitem),
      |r AS (
      |  SELECT l_returnflag, h // $hllSplit AS bucket,
      |    $hllRhoSql AS rho
      |  FROM h),
      |regs AS (
      |  SELECT l_returnflag, bucket, max(rho) AS m
      |  FROM r GROUP BY 1, 2),
      |hll AS (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(pow(2e0, 55 - m) AS BIGINT)) AS BIGINT)
      |      + ($hllM - count(*)) * $hllScale AS sum_scaled
      |  FROM regs GROUP BY 1),
      |est AS (
      |  SELECT l_returnflag,
      |    round(${hllEstSql("sum_scaled")}, 2) AS hll_parts_est
      |  FROM hll),
      |smp AS (
      |  SELECT l_returnflag, l_extendedprice AS v
      |  FROM lineitem
      |  WHERE ('0x' || substr(md5(concat_ws('|', l_orderkey,
      |    l_linenumber)), 1, 8))::BIGINT < 268435456),
      |bv AS (
      |  SELECT l_returnflag, v, count(*) AS c FROM smp GROUP BY 1, 2),
      |cw AS (
      |  SELECT *, sum(c) OVER (PARTITION BY l_returnflag ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(c) OVER (PARTITION BY l_returnflag) AS n
      |  FROM bv),
      |med AS (
      |  SELECT l_returnflag,
      |    CAST(min(CASE WHEN cum * 2 >= n THEN v END) AS DOUBLE)
      |      AS sample_median_price,
      |    CAST(min(n) AS BIGINT) AS sample_n
      |  FROM cw GROUP BY 1)
      |SELECT est.l_returnflag, est.hll_parts_est, med.sample_n,
      |  med.sample_median_price
      |FROM est JOIN med USING (l_returnflag)""".stripMargin

  /** HLL MERGEABILITY — the property that makes the sketch family work
   *  at 100 TB: per-DAY register tables (the md5-HLL of q_approx_agg_md5
   *  over daily active users) merged by bucket-wise MAX equal the
   *  registers built directly over the whole period, so the period
   *  estimate never rescans history. The query emits both estimates and
   *  the (always-true, structurally) equality flag; both paths and the
   *  identity replay in the oracle. Register state is m-bounded per day
   *  — days × 64 longs for a year of history. */
  private[graft] def hllMergeDailyQ(s: SparkSession, dir: String): DataFrame = {
    val hashed = events(s, dir)
      .select(expr("ts div 86400000000000").as("day"),
        expr("graft_md5_prefix_long(CAST(user_id AS STRING), 15)").as("h"))
      .select(col("day"),
        expr(s"h div $hllSplit").as("bucket"),
        expr(s"CAST($hllRhoSql AS BIGINT)").as("rho"))
    val daily = hashed.groupBy(col("day"), col("bucket"))
      .agg(max(col("rho")).as("m"))
    def estimate(regs: DataFrame): DataFrame = regs
      .agg(expr("sum(CAST(pow(2e0, 55 - m) AS BIGINT))").as("sum_present"),
        count(lit(1)).as("n_buckets"))
      .select(round(expr(hllEstSql(
        s"(sum_present + ($hllM - n_buckets) * $hllScale)")), 2).as("est"))
    val merged = estimate(
      daily.groupBy(col("bucket")).agg(max(col("m")).as("m")))
      .withColumnRenamed("est", "est_merged")
    val direct = estimate(
      hashed.groupBy(col("bucket")).agg(max(col("rho")).as("m")))
      .withColumnRenamed("est", "est_direct")
    merged.crossJoin(direct)
      .withColumn("merge_lossless", col("est_merged") === col("est_direct"))
  }

  private[graft] val hllMergeDailyOracle =
    s"""WITH h AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
      |      AS h
      |  FROM events),
      |r AS (
      |  SELECT day, h // $hllSplit AS bucket, $hllRhoSql AS rho
      |  FROM h),
      |daily AS (
      |  SELECT day, bucket, max(rho) AS m FROM r GROUP BY 1, 2),
      |mreg AS (SELECT bucket, max(m) AS m FROM daily GROUP BY 1),
      |dreg AS (SELECT bucket, max(rho) AS m FROM r GROUP BY 1),
      |me AS (
      |  SELECT round(${hllEstSql(
          s"(CAST(sum(CAST(pow(2e0, 55 - m) AS BIGINT)) AS BIGINT) + " +
            s"($hllM - count(*)) * $hllScale)")}, 2) AS est_merged
      |  FROM mreg),
      |de AS (
      |  SELECT round(${hllEstSql(
          s"(CAST(sum(CAST(pow(2e0, 55 - m) AS BIGINT)) AS BIGINT) + " +
            s"($hllM - count(*)) * $hllScale)")}, 2) AS est_direct
      |  FROM dreg)
      |SELECT est_merged, est_direct,
      |  est_merged = est_direct AS merge_lossless
      |FROM me, de""".stripMargin

  /** Linear multi-touch attribution: every DISTINCT channel a user
   *  touched before a purchase shares its conversion and value credit
   *  equally (no-touch purchases credit 'direct') — the model the
   *  first/last-touch pair (q_touch_attribution) can't express. The
   *  running distinct-channel set is a windowed collect_set (state
   *  bounded by the channel universe, not rows); credits are summed
   *  EXACTLY per (channel, n) as integers/decimals and the 1/n
   *  reduction folds LEFT over the n-sorted group list — the Holt-fold
   *  idiom, so the ≤|channels| double additions run in one fixed order
   *  both engines replay. */
  private[graft] def linearAttributionQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val purchases = events(s, dir)
      .withColumn("chs", collect_set(touch).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("chs",
        when(size(col("chs")) === 0, array(lit("direct")))
          .otherwise(col("chs")))
      .withColumn("n", size(col("chs")))
      .select(explode(col("chs")).as("touch"), col("n"),
        col("value").cast(DecimalType(18, 2)).as("v"))
    purchases
      .groupBy(col("touch"), col("n"))
      .agg(count(lit(1)).as("c"), sum(col("v")).as("vs"))
      .groupBy(col("touch"))
      .agg(expr(
        """aggregate(sort_array(collect_list(struct(n, c, vs))),
          |  named_struct('cc', 0e0, 'vv', 0e0),
          |  (acc, x) -> named_struct(
          |    'cc', acc.cc + CAST(x.c AS DOUBLE) / x.n,
          |    'vv', acc.vv + CAST(x.vs AS DOUBLE) / x.n))""".stripMargin)
        .as("f"))
      .select(col("touch"),
        round(col("f.cc"), 6).as("credited_conversions"),
        round(col("f.vv"), 2).as("credited_value"))
  }

  private[graft] val linearAttributionOracle =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, epoch_ns(ts) AS tns, event_id, event_type, value
      |  FROM events),
      |pu AS (SELECT * FROM ev WHERE event_type = 'purchase'),
      |pr AS (
      |  SELECT p.event_id AS pid, e.event_type AS touch
      |  FROM pu p JOIN ev e ON e.user_id = p.user_id
      |    AND (e.tns < p.tns OR (e.tns = p.tns AND e.event_id < p.event_id))
      |    AND e.event_type <> 'purchase'
      |  GROUP BY 1, 2),
      |np AS (SELECT pid, count(*) AS n FROM pr GROUP BY 1),
      |base AS (
      |  SELECT p.event_id AS pid, CAST(p.value AS DECIMAL(18,2)) AS v,
      |    coalesce(np.n, 0) AS n
      |  FROM pu p LEFT JOIN np ON np.pid = p.event_id),
      |cred AS (
      |  SELECT pr.touch, b.n, b.v FROM base b JOIN pr ON pr.pid = b.pid
      |  UNION ALL
      |  SELECT 'direct', CAST(1 AS BIGINT), v FROM base WHERE n = 0),
      |g AS (
      |  SELECT touch, n, count(*) AS c,
      |    sum(v) AS vs,
      |    row_number() OVER (PARTITION BY touch ORDER BY n) AS k,
      |    count(*) OVER (PARTITION BY touch) AS kmax
      |  FROM cred GROUP BY 1, 2),
      |f AS (
      |  SELECT touch, k, kmax,
      |    0e0 + CAST(c AS DOUBLE) / n AS cc,
      |    0e0 + CAST(vs AS DOUBLE) / n AS vv
      |  FROM g WHERE k = 1
      |  UNION ALL
      |  SELECT g.touch, g.k, g.kmax,
      |    f.cc + CAST(g.c AS DOUBLE) / g.n,
      |    f.vv + CAST(g.vs AS DOUBLE) / g.n
      |  FROM g JOIN f ON g.touch = f.touch AND g.k = f.k + 1)
      |SELECT touch, round(cc, 6) AS credited_conversions,
      |  round(vv, 2) AS credited_value
      |FROM f WHERE k = kmax""".stripMargin

  /** Market share per nation within each order year of the ASIA slice —
   *  the two-level share readout layered on the q_tpch_q5 join chain:
   *  exact decimal revenue per (year, nation), the year total from a
   *  window over the SAME aggregate (nations-bounded frame), one double
   *  division per row. */
  private[graft] def marketShareQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byNation = asiaRevenueFrame(s, dir,
        s.read.parquet(t(dir, "orders"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year")))
      .groupBy(col("o_year"), col("n_name"))
      .agg(sum(col("rev")).as("rev"))
    byNation
      .withColumn("tot",
        sum(col("rev")).over(Window.partitionBy(col("o_year"))))
      .select(col("o_year"), col("n_name"),
        col("rev").cast("double").as("revenue"),
        round(col("rev").cast("double") / col("tot").cast("double"), 6)
          .as("share"))
  }

  private[graft] val marketShareOracle =
    """WITH b AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year, n_name,
      |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |      AS rev
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |    AND s_nationkey = c_nationkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA'
      |  GROUP BY 1, 2)
      |SELECT o_year, n_name, CAST(rev AS DOUBLE) AS revenue,
      |  round(CAST(rev AS DOUBLE) /
      |    CAST(sum(rev) OVER (PARTITION BY o_year) AS DOUBLE), 6) AS share
      |FROM b""".stripMargin

  /** EXACT-percentile length gate — the p5–p95 outlier filter every
   *  curation pipeline runs before training (truncated heads, runaway
   *  concatenations). Spark's `percentile` and DuckDB's `quantile_cont`
   *  share the R-7 linear-interpolation definition, so the bounds are
   *  bit-identical and the filter needs no rounding slack. The 2-value
   *  bound row joins back BROADCAST; at 100 TB exact percentiles are one
   *  sort-free typed aggregate (Spark buffers per-partition counts),
   *  with `percentile_approx` (q_approx_agg) as the sketch fallback. */
  private[graft] def lengthFilterQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val bounds = d.agg(expr("percentile(n_chars, array(0.05, 0.95))").as("b"))
      .select(col("b").getItem(0).as("lo"), col("b").getItem(1).as("hi"))
    d.crossJoin(broadcast(bounds))
      .filter(col("n_chars").cast("double") >= col("lo") &&
        col("n_chars").cast("double") <= col("hi"))
      .select(col("doc_id"), col("n_chars"))
  }

  private[graft] val lengthFilterOracle =
    """WITH b AS (
      |  SELECT quantile_cont(n_chars, 0.05) AS lo,
      |         quantile_cont(n_chars, 0.95) AS hi
      |  FROM documents)
      |SELECT doc_id, n_chars FROM documents, b
      |WHERE CAST(n_chars AS DOUBLE) >= lo AND CAST(n_chars AS DOUBLE) <= hi""".stripMargin

  /** Per-source robust statistics (median / IQR / mean length) — the
   *  source-level health dashboard of a corpus: outlier-resistant
   *  centers expose a broken crawler or template flood that a plain
   *  mean hides. One hash-partitioned aggregate, exact percentiles. */
  private[graft] def robustStatsQ(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("percentile(n_chars, 0.5)").as("median_chars"),
        round(expr("percentile(n_chars, 0.75)") -
          expr("percentile(n_chars, 0.25)"), 6).as("iqr_chars"),
        round(avg(col("n_chars")), 6).as("mean_chars"))

  private[graft] val robustStatsOracle =
    """SELECT source, count(*) AS n_docs,
      |  quantile_cont(n_chars, 0.5) AS median_chars,
      |  round(quantile_cont(n_chars, 0.75) - quantile_cont(n_chars, 0.25), 6) AS iqr_chars,
      |  round(avg(n_chars), 6) AS mean_chars
      |FROM documents GROUP BY source""".stripMargin

  /** Deterministic hash-based stratified sampling: a row is kept iff the
   *  first md5 byte of (salt, id) falls under its stratum's rate — the
   *  reproducible sampling used for corpus subsets (same rows on every
   *  engine/run, no RNG state; md5 gives an identical DuckDB oracle,
   *  unlike seed-based `sampleBy`). en is kept at ~32%, others ~10%. */
  private[graft] def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(substring(md5(concat(lit("salt42:"), col("doc_id").cast("string"))), 1, 2)
        < when(col("lang") === "en", "52").otherwise("1a"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sampled_chars"))

  private[graft] val stratifiedSampleOracle =
    """SELECT lang, count(*) AS n_sampled,
      |       CAST(sum(n_chars) AS BIGINT) AS sampled_chars
      |FROM documents
      |WHERE substring(md5('salt42:' || doc_id), 1, 2)
      |      < CASE WHEN lang = 'en' THEN '52' ELSE '1a' END
      |GROUP BY lang""".stripMargin

  /** A6: distinct aggregation (exact count-distinct per group). */
  private[graft] def distinctAgg(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "lineitem"))
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n_rows"))

  private[graft] val distinctAggOracle =
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** A7: cube with subtotals over two dimensions. */
  private[graft] def cubeAgg(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "orders"))
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  private[graft] val cubeAggOracle =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Bucketed co-located join: both sides written bucketed on the join
   *  key, so the sort-merge join needs NO exchange — the pre-partitioning
   *  pattern for repeated fact-fact joins at scale. Result equals the
   *  plain join (the oracle). */
  private[graft] def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    // drop catalog entries AND stale warehouse dirs (a fresh in-memory
    // catalog doesn't know about directories left by a previous session)
    Seq("graft_li_bucketed", "graft_ord_bucketed").foreach { tbl =>
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      rmTree(new java.io.File(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl))
    }
    s.read.parquet(t(dir, "lineitem")).select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_li_bucketed")
    s.read.parquet(t(dir, "orders")).select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_ord_bucketed")
    // force sort-merge so the plan exercises bucket co-location (at test
    // scale AQE would broadcast the small side and hide it); with both
    // sides bucketed on the key the SMJ runs with ZERO exchanges
    s.table("graft_li_bucketed").hint("merge")
      .join(s.table("graft_ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("sum_qty"))
  }

  private[graft] val bucketedJoinOracle =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** O3: union + distinct set semantics. */
  private[graft] def unionDistinct(s: SparkSession, dir: String): DataFrame = {
    val a = events(s, dir).select(col("event_type").as("tag"))
    val b = s.read.parquet(t(dir, "orders")).select(col("o_orderpriority").as("tag"))
    a.union(b).distinct()
  }

  private[graft] val unionDistinctOracle =
    "SELECT DISTINCT tag FROM (SELECT event_type AS tag FROM events UNION ALL SELECT o_orderpriority FROM orders)"

  /** O3 completion: FULL OUTER join — customers × a filtered order
   *  slice, keeping unmatched rows from BOTH sides (the join-matrix row
   *  the equi/semi/anti/range/asof family didn't cover). */
  private[graft] def fullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val c = s.read.parquet(t(dir, "customer"))
      .filter(col("c_custkey") < 200)
      .select(col("c_custkey"), col("c_acctbal"))
    val o = s.read.parquet(t(dir, "orders"))
      .filter(col("o_custkey") < 150 && col("o_totalprice") > 100000)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_acctbal"), coalesce(col("n_big_orders"), lit(0L)).as("n_big_orders"),
        col("c_custkey").isNull.as("order_only"),
        col("o_custkey").isNull.as("customer_only"))
  }

  private[graft] val fullOuterJoinOracle =
    """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
      |  c.c_acctbal, coalesce(o.n_big_orders, 0) AS n_big_orders,
      |  c.c_custkey IS NULL AS order_only,
      |  o.o_custkey IS NULL AS customer_only
      |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 200) c
      |FULL OUTER JOIN (
      |  SELECT o_custkey, count(*) AS n_big_orders FROM orders
      |  WHERE o_custkey < 150 AND o_totalprice > 100000 GROUP BY 1) o
      |ON c.c_custkey = o.o_custkey""".stripMargin

  /** O3 completion: INTERSECT / EXCEPT (distinct set semantics) over
   *  two event-type slices of the users dimension. */
  private[graft] def setOps(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val buyers = ev.filter(col("event_type") === "purchase").select(col("user_id"))
    val clickers = ev.filter(col("event_type") === "click").select(col("user_id"))
    buyers.intersect(clickers).withColumn("relation", lit("both"))
      .unionAll(buyers.except(clickers).withColumn("relation", lit("buy_only")))
      .unionAll(clickers.except(buyers).withColumn("relation", lit("click_only")))
  }

  private[graft] val setOpsOracle =
    """WITH b AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id FROM events WHERE event_type = 'click')
      |SELECT user_id, 'both' AS relation FROM (SELECT * FROM b INTERSECT SELECT * FROM c)
      |UNION ALL
      |SELECT user_id, 'buy_only' FROM (SELECT * FROM b EXCEPT SELECT * FROM c)
      |UNION ALL
      |SELECT user_id, 'click_only' FROM (SELECT * FROM c EXCEPT SELECT * FROM b)""".stripMargin
}
