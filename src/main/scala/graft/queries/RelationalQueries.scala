package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Core relational surface (SURVEY.md §2.B): scans, filters, joins of all
  * flavors, aggregation, grouping sets, windows, set ops, subqueries,
  * CTEs, JSON ops, sorts/limits.
  *
  * Numeric-determinism discipline: the driver hash-compares against a
  * DuckDB oracle, and floating-point SUM order is nondeterministic, so
  * every aggregate over a double column goes through an exact DECIMAL
  * cast (the data is exact 2-decimal money values, so the cast is
  * lossless and engine-independent) and only the final value is cast
  * back to DOUBLE. Ratios are computed as exact-decimal-sum / count.
  */
object RelationalQueries {

  /** Exact-decimal cast for money/quantity doubles (values are 2dp). */
  private def dec4(c: Column): Column = c.cast(DecimalType(28, 4))
  /** Exact cast for 2dp*2dp(*2dp) products (at most 6 decimal places). */
  private def dec6(c: Column): Column = c.cast(DecimalType(28, 6))
  private def dsum4(c: Column): Column = sum(dec4(c)).cast("double")
  private def dsum6(c: Column): Column = sum(dec6(c)).cast("double")

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // --------------------------------------------------------------------
  // q01 — pricing summary (TPC-H Q1 shape): scan→filter→hash-agg→sort.
  // Scale: partial (map-side) aggregation on 2 low-cardinality keys; one
  // shuffle of ~6 groups regardless of input size.
  private val q01 = QueryDef(
    "q01_pricing_summary",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum4(col("l_quantity")).as("sum_qty"),
          dsum4(col("l_extendedprice")).as("sum_base_price"),
          dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          (sum(dec4(col("l_quantity"))).cast("double") / count(col("l_quantity"))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / count(l_quantity) AS avg_qty,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  // --------------------------------------------------------------------
  // q02 — revenue by nation (TPC-H Q5 shape): 5-way join with two
  // broadcast-able dims (region, nation) and a supplier/customer
  // co-nation condition. Catalyst broadcasts the small sides (AQE).
  private val q02 = QueryDef(
    "q02_revenue_by_nation",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      cust
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
      CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      count(*) AS n_items
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  // --------------------------------------------------------------------
  // q03 — shipping priority (TPC-H Q3 shape): selective filters pushed to
  // the parquet scan on both fact tables, then join + top-k.
  private val q03 = QueryDef(
    "q03_shipping_priority",
    (s, dir) => {
      val cut = lit("1997-06-30").cast("timestamp_ntz")
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders").filter(col("o_orderdate") < cut),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_shipdate") > cut),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
      CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  // --------------------------------------------------------------------
  // q04 — order priority check (TPC-H Q4 shape): EXISTS-correlated
  // subquery; Catalyst rewrites to a left-semi join (no row explosion).
  private val q04 = QueryDef(
    "q04_order_priority",
    (s, dir) => {
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      ord.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // --------------------------------------------------------------------
  // q05 — forecast revenue (TPC-H Q6 shape): pure scan+filter+scalar agg;
  // all predicates reach the parquet reader (PushedFilters).
  private val q05 = QueryDef(
    "q05_forecast_revenue",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum6(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_rows")),
    Some("""SELECT
      CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      count(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  // --------------------------------------------------------------------
  // q06 — top returned-revenue customers (TPC-H Q10 shape).
  private val q06 = QueryDef(
    "q06_top_return_customers",
    (s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name,
      CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  // --------------------------------------------------------------------
  // q07 — distinct suppliers per brand/size bucket (TPC-H Q16 shape):
  // exact COUNT(DISTINCT) → Spark plans a two-phase distinct aggregate.
  private val q07 = QueryDef(
    "q07_supplier_cnt",
    (s, dir) => {
      t(s, dir, "part")
        .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
        .filter(col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    },
    Some("""SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM part JOIN lineitem ON p_partkey = l_partkey
      WHERE p_size IN (1,5,9,13,17,21,25,29)
      GROUP BY p_brand, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_size"""))

  // --------------------------------------------------------------------
  // q08 — left-semi join: customers with at least one high-value order.
  private val q08 = QueryDef(
    "q08_semi_join",
    (s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_cust"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name, count(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      GROUP BY n_name ORDER BY n_name"""))

  // --------------------------------------------------------------------
  // q09 — left-anti join: customers with no order above the threshold.
  private val q09 = QueryDef(
    "q09_anti_join",
    (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      ORDER BY c_custkey"""))

  // --------------------------------------------------------------------
  // q10 — GROUP_CONCAT analog (SURVEY §2.B "Aggregation"): deterministic
  // ordered string aggregation via sort_array(collect_list).
  private val q10 = QueryDef(
    "q10_group_concat",
    (s, dir) =>
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy(col("r_name")),
    Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      count(*) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  // --------------------------------------------------------------------
  // q11 — ranking window functions over a unique total order.
  private val q11 = QueryDef(
    "q11_window_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          sum(dec4(col("o_totalprice"))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_total"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
      row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk,
      lag(o_totalprice, 1) OVER w AS prev_price,
      lead(o_totalprice, 1) OVER w AS next_price,
      CAST(sum(CAST(o_totalprice AS DECIMAL(28,4)))
        OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      FROM orders WHERE o_custkey < 50
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_custkey, rn"""))

  // --------------------------------------------------------------------
  // q12 — sliding-frame window aggregate (moving sum/avg over 3 rows).
  private val q12 = QueryDef(
    "q12_window_frames",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      t(s, dir, "orders").filter(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec4(col("o_totalprice"))).over(w).cast("double").as("moving_sum"),
          (sum(dec4(col("o_totalprice"))).over(w).cast("double") /
            count(lit(1)).over(w)).as("moving_avg"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
      CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) OVER w AS DOUBLE) AS moving_sum,
      CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) OVER w AS DOUBLE) / count(*) OVER w AS moving_avg
      FROM orders WHERE o_custkey < 30
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""))

  // --------------------------------------------------------------------
  // q13 — ROLLUP (MySQL WITH ROLLUP analog, SURVEY §2.B grouping sets).
  private val q13 = QueryDef(
    "q13_rollup",
    (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum4(col("c_acctbal")).as("total_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first),
    Some("""SELECT r_name, n_name, count(*) AS n_cust,
      CAST(sum(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS total_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""))

  // --------------------------------------------------------------------
  // q14 — CUBE over two independent dimensions.
  private val q14 = QueryDef(
    "q14_cube",
    (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum4(col("o_totalprice")).as("total_price"))
        .orderBy(col("c_mktsegment").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
    Some("""SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY CUBE (c_mktsegment, o_orderpriority)
      ORDER BY c_mktsegment ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  // --------------------------------------------------------------------
  // q15 — GROUPING SETS via SQL (tests the SQL surface directly).
  private val q15 = QueryDef(
    "q15_grouping_sets",
    (s, dir) => {
      Tables.register(s, dir)
      s.sql("""SELECT r_name, n_name, count(*) AS n_sup
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
    },
    Some("""SELECT r_name, n_name, count(*) AS n_sup
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY GROUPING SETS ((r_name), (n_name), ())
      ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""))

  // --------------------------------------------------------------------
  // q16 — set operations: INTERSECT / EXCEPT / UNION ALL composition.
  private val q16 = QueryDef(
    "q16_set_ops",
    (s, dir) => {
      val custN = t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
      val supN = t(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
      custN.intersect(supN).select(lit("both").as("src"), col("nk"))
        .unionAll(custN.except(supN).select(lit("cust_only").as("src"), col("nk")))
        .orderBy(col("src"), col("nk"))
    },
    Some("""SELECT 'both' AS src, nk FROM (
        SELECT DISTINCT c_nationkey AS nk FROM customer
        INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'cust_only' AS src, nk FROM (
        SELECT DISTINCT c_nationkey AS nk FROM customer
        EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
      ORDER BY src, nk"""))

  // --------------------------------------------------------------------
  // q17 — DISTINCT aggregates alongside plain ones.
  private val q17 = QueryDef(
    "q17_distinct_agg",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          sum_distinct(dec4(col("o_totalprice"))).cast("double").as("sum_distinct_price"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
      CAST(sum(DISTINCT CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_distinct_price,
      count(*) AS n_orders
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // --------------------------------------------------------------------
  // q18 — HAVING over grouped counts.
  private val q18 = QueryDef(
    "q18_having",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum4(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 13)
        .orderBy(col("o_custkey")),
    Some("""SELECT o_custkey, count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey HAVING count(*) >= 13 ORDER BY o_custkey"""))

  // --------------------------------------------------------------------
  // q19 — CASE buckets + conditional aggregation (pivot-style).
  private val q19 = QueryDef(
    "q19_case_pivot",
    (s, dir) => {
      val bucket = when(col("o_totalprice") < 100000, "low")
        .when(col("o_totalprice") < 300000, "mid").otherwise("high")
      t(s, dir, "orders")
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"))
        .orderBy(col("bucket"))
    },
    Some("""SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
        WHEN o_totalprice < 300000 THEN 'mid' ELSE 'high' END AS bucket,
      count(*) AS n_orders,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      FROM orders GROUP BY 1 ORDER BY bucket"""))

  // --------------------------------------------------------------------
  // q20 — IN (subquery) + LIKE + BETWEEN filter composition.
  private val q20 = QueryDef(
    "q20_in_subquery",
    (s, dir) => {
      val hot = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
        .select(col("l_partkey"))
      t(s, dir, "part")
        .join(hot, col("p_partkey") === col("l_partkey"), "left_semi")
        .filter(col("p_name").like("%a%") && col("p_retailprice").between(500, 1500))
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey, p_name, p_retailprice FROM part
      WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
        AND p_name LIKE '%a%' AND p_retailprice BETWEEN 500 AND 1500
      ORDER BY p_partkey"""))

  // --------------------------------------------------------------------
  // q21 — correlated scalar subquery: customers above their nation's
  // average balance (computed as exact-sum/count for determinism).
  private val q21 = QueryDef(
    "q21_correlated_scalar",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val natAvg = cust.groupBy(col("c_nationkey").as("nk"))
        .agg((sum(dec4(col("c_acctbal"))).cast("double") / count(lit(1))).as("nation_avg"))
      cust.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
        .filter(col("c_acctbal") > col("nation_avg"))
        .select(col("c_custkey"), col("c_acctbal"), col("nation_avg"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_acctbal, (
        SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(28,4))) AS DOUBLE) / count(*)
        FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey) AS nation_avg
      FROM customer c
      WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(28,4))) AS DOUBLE) / count(*)
        FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey"""))

  // --------------------------------------------------------------------
  // q22 — EXISTS + NOT EXISTS combined: nations with customers but no
  // suppliers.
  private val q22 = QueryDef(
    "q22_exists_not_exists",
    (s, dir) => {
      val nat = t(s, dir, "nation")
      nat.join(t(s, dir, "customer"), col("n_nationkey") === col("c_nationkey"), "left_semi")
        .join(t(s, dir, "supplier"), col("n_nationkey") === col("s_nationkey"), "left_anti")
        .select(col("n_nationkey"), col("n_name"))
        .orderBy(col("n_nationkey"))
    },
    Some("""SELECT n_nationkey, n_name FROM nation
      WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
        AND NOT EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
      ORDER BY n_nationkey"""))

  // --------------------------------------------------------------------
  // q23 — CTEs (incl. a second CTE referencing the first): top supplier
  // by revenue (TPC-H Q15 shape). Exercises the SQL CTE surface.
  private val q23 = QueryDef(
    "q23_cte_top_supplier",
    (s, dir) => {
      Tables.register(s, dir)
      // Same semantics as the oracle's two-CTE formulation, but the
      // aggregate is computed once and ranked (Spark does not
      // materialize CTEs, so joining revenue against its own max would
      // scan + aggregate lineitem twice).
      s.sql("""WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
            sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS total
          FROM lineitem GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
        FROM supplier JOIN (
          SELECT supplier_no, total, rank() OVER (ORDER BY total DESC) AS rk
          FROM revenue) r ON s_suppkey = supplier_no
        WHERE rk = 1
        ORDER BY s_suppkey""")
    },
    Some("""WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
          sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS total
        FROM lineitem GROUP BY l_suppkey),
      top AS (SELECT max(total) AS max_total FROM revenue)
      SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      JOIN top ON total = max_total
      ORDER BY s_suppkey"""))

  // --------------------------------------------------------------------
  // q24 — FULL OUTER join with coalesced keys.
  private val q24 = QueryDef(
    "q24_full_outer",
    (s, dir) => {
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("n_cust"))
      val p = t(s, dir, "supplier").groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("n_sup"))
      c.join(p, col("ck") === col("sk"), "full_outer")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0)).as("n_cust"),
          coalesce(col("n_sup"), lit(0)).as("n_sup"))
        .orderBy(col("nationkey"))
    },
    Some("""SELECT coalesce(ck, sk) AS nationkey,
      coalesce(n_cust, 0) AS n_cust, coalesce(n_sup, 0) AS n_sup
      FROM (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey AS sk, count(*) AS n_sup FROM supplier GROUP BY 1) s
      ON ck = sk ORDER BY nationkey"""))

  // --------------------------------------------------------------------
  // q25 — CROSS join (small × small).
  private val q25 = QueryDef(
    "q25_cross_join",
    (s, dir) => {
      val statuses = t(s, dir, "orders").select(col("o_orderstatus")).distinct()
      t(s, dir, "region").crossJoin(statuses)
        .select(col("r_name"), col("o_orderstatus"))
        .orderBy(col("r_name"), col("o_orderstatus"))
    },
    Some("""SELECT r_name, o_orderstatus
      FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
      ORDER BY r_name, o_orderstatus"""))

  // --------------------------------------------------------------------
  // q26 — non-equi (θ) self-join: nation pairs within the same region.
  private val q26 = QueryDef(
    "q26_theta_self_join",
    (s, dir) => {
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("k1"),
        col("n_name").as("name1"), col("n_regionkey").as("rk1"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("k2"),
        col("n_name").as("name2"), col("n_regionkey").as("rk2"))
      n1.join(n2, col("rk1") === col("rk2") && col("k1") < col("k2"))
        .select(col("rk1").as("regionkey"), col("name1"), col("name2"))
        .orderBy(col("regionkey"), col("name1"), col("name2"))
    },
    Some("""SELECT n1.n_regionkey AS regionkey, n1.n_name AS name1, n2.n_name AS name2
      FROM nation n1 JOIN nation n2
        ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
      ORDER BY regionkey, name1, name2"""))

  // --------------------------------------------------------------------
  // q27 — JSON extraction over the events props column.
  private val q27 = QueryDef(
    "q27_json_ops",
    (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n_events,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
      max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // --------------------------------------------------------------------
  // q28 — explicit NULL ordering + LIMIT over a unique tie-break.
  private val q28 = QueryDef(
    "q28_null_ordering",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_tax"), lit(0.0)).as("tax_or_null"))
        .orderBy(col("tax_or_null").asc_nulls_first, col("l_orderkey"),
          col("l_linenumber"))
        .limit(100),
    Some("""SELECT l_orderkey, l_linenumber, nullif(l_tax, 0.0) AS tax_or_null
      FROM lineitem
      ORDER BY tax_or_null ASC NULLS FIRST, l_orderkey, l_linenumber LIMIT 100"""))

  // --------------------------------------------------------------------
  // q29 — top-k per group via window (common operational pattern).
  private val q29 = QueryDef(
    "q29_topk_per_group",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy(col("c_mktsegment"), col("rn"))
    },
    Some("""SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY c_mktsegment
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey) x
      WHERE rn <= 3 ORDER BY c_mktsegment, rn"""))

  // --------------------------------------------------------------------
  // q30 — max_by / arg_max (the reference's LAST(... ORDER BY ...) CDC
  // condense primitive, SURVEY §2.B "Ordered-last agg").
  private val q30 = QueryDef(
    "q30_arg_max",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max_by(col("o_totalprice"), col("o_orderkey")).as("latest_price"),
          max(col("o_orderkey")).as("latest_order"))
        .orderBy(col("o_custkey")),
    Some("""SELECT o_custkey, arg_max(o_totalprice, o_orderkey) AS latest_price,
      max(o_orderkey) AS latest_order
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  // --------------------------------------------------------------------
  // q31 — approximate distinct (HLL). Sketch values are engine-specific
  // (Spark HLL ≠ DuckDB HLL bit-for-bit), so the HASHABLE output is the
  // exact distinct counts plus per-engine booleans asserting each
  // engine's own sketch lands within the ±10% bound of its own exact
  // count — every column is deterministic on both sides, so the driver
  // hash-checks this like any other query while the approx operator
  // still executes for real.
  // Plan note: two different DISTINCT columns in one aggregate make
  // Spark Expand the input (one replica per distinct group + one for
  // the plain aggregates — 3× the scan feeding the shuffle). Instead:
  // dedup each (flag, key) pair first — a groupBy whose map-side
  // partial collapses duplicates BEFORE the shuffle — then count the
  // survivors; the HLL sketch is insertion-idempotent, so building it
  // over the deduped pairs yields the identical estimate. Two slim
  // pipelines + a 3-row join in place of one 3×-expanded shuffle.
  private val q31 = QueryDef(
    "q31_approx_distinct",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      // count(DISTINCT key) excludes NULLs but a groupBy would keep a
      // NULL-key group — drop NULL keys up front so the dedup-first
      // rewrite matches DISTINCT-count semantics on nullable columns
      // (both keys are non-null in TPC-H, but don't rely on it).
      def side(key: String, cnt: String, ok: String) =
        li.filter(col(key).isNotNull)
          .groupBy(col("l_returnflag"), col(key)).agg(count(lit(1)).as("__n"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as(cnt),
            approx_count_distinct(col(key)).as("__a"))
          .select(col("l_returnflag"), col(cnt),
            (abs(col("__a") - col(cnt)) <= col(cnt) * 0.1).as(ok))
      side("l_partkey", "exact_parts", "approx_parts_ok")
        .join(side("l_orderkey", "exact_orders", "approx_orders_ok"),
          "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          col("approx_parts_ok"), col("approx_orders_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      count(DISTINCT l_partkey) AS exact_parts,
      count(DISTINCT l_orderkey) AS exact_orders,
      abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
        <= count(DISTINCT l_partkey) * 0.1 AS approx_parts_ok,
      abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey))
        <= count(DISTINCT l_orderkey) * 0.1 AS approx_orders_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // --------------------------------------------------------------------
  // q32 — as-of join over the events stream: for each purchase, the most
  // recent click at-or-before it by the same user. Implemented the
  // scalable way — single shuffle on user_id, one ordered window pass
  // (no per-user cross join); this is the plan that survives 100 TB.
  private val q32 = QueryDef(
    "q32_asof_join",
    (s, dir) => {
      // ts is raw nanos (nanosAsLong); truncate to µs to match DuckDB's
      // parquet ns→µs coercion so the log-position ordering is identical.
      val ev = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), expr("ts div 1000").as("tsn"), col("event_id"), col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tsn"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("click_id",
          last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
        .withColumn("click_tsn",
          last(when(col("event_type") === "click", col("tsn")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("tsn").as("purchase_tsn"), col("click_id"), col("click_tsn"))
        .orderBy(col("purchase_id"))
    },
    Some("""WITH tagged AS (
        SELECT user_id, epoch_us(ts) AS tsn, event_id, event_type
        FROM events WHERE event_type IN ('click', 'purchase'))
      SELECT event_id AS purchase_id, user_id, tsn AS purchase_tsn, click_id, click_tsn
      FROM (
        SELECT *,
          last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
            OVER w AS click_id,
          last_value(CASE WHEN event_type = 'click' THEN tsn END IGNORE NULLS)
            OVER w AS click_tsn
        FROM tagged
        WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) x
      WHERE event_type = 'purchase' ORDER BY purchase_id"""))

  // --------------------------------------------------------------------
  // q33 — LATERAL correlated subquery with ORDER BY + LIMIT (the
  // reference's TestLateralJoin surface, main_test.go:403).
  private val q33 = QueryDef(
    "q33_lateral",
    (s, dir) => {
      Tables.register(s, dir)
      s.sql("""SELECT r_name, n_name FROM region
        JOIN LATERAL (SELECT n_name FROM nation
          WHERE n_regionkey = r_regionkey ORDER BY n_name LIMIT 2)
        ORDER BY r_name, n_name""")
    },
    Some("""SELECT r_name, n_name FROM region,
      LATERAL (SELECT n_name FROM nation
        WHERE n_regionkey = r_regionkey ORDER BY n_name LIMIT 2) t
      ORDER BY r_name, n_name"""))

  // --------------------------------------------------------------------
  // q34 — JSON_TABLE analog (main_test.go:430): JSON array → rows with
  // ordinality, via from_json + posexplode.
  private val q34 = QueryDef(
    "q34_json_table",
    (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_id") < 1000)
        .select(col("event_id"),
          posexplode(from_json(
            concat(lit("["), col("props"), lit(","), col("props"), lit("]")),
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("k",
                  org.apache.spark.sql.types.IntegerType)))))))
        .select(col("event_id"), col("pos").cast("int").as("idx"),
          col("col.k").as("k"))
        .orderBy(col("event_id"), col("idx")),
    Some("""SELECT event_id, CAST(idx AS INT) AS idx,
      CAST(json_extract_string(concat('[', props, ',', props, ']'),
        '$[' || idx || '].k') AS INT) AS k
      FROM events, (SELECT unnest(range(0, 2)) AS idx) i
      WHERE event_id < 1000
      ORDER BY event_id, idx"""))

  // --------------------------------------------------------------------
  // q35 — JOIN ... USING (shared-name equi-join, coalesced key output).
  private val q35 = QueryDef(
    "q35_join_using",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey"), col("c_custkey"))
      val sup = t(s, dir, "supplier")
        .select(col("s_nationkey").as("nationkey"), col("s_suppkey"))
      c.join(sup, Seq("nationkey"))
        .groupBy(col("nationkey"))
        .agg(countDistinct(col("c_custkey")).as("n_cust"),
          countDistinct(col("s_suppkey")).as("n_sup"))
        .orderBy(col("nationkey"))
    },
    Some("""SELECT nationkey, count(DISTINCT c_custkey) AS n_cust,
      count(DISTINCT s_suppkey) AS n_sup
      FROM (SELECT c_nationkey AS nationkey, c_custkey FROM customer) c
      JOIN (SELECT s_nationkey AS nationkey, s_suppkey FROM supplier) s
      USING (nationkey)
      GROUP BY nationkey ORDER BY nationkey"""))

  // --------------------------------------------------------------------
  // q36 — string/date/math function corpus (§2.B "function corpus" row):
  // the dialect-shared core both engines evaluate identically.
  private val q36 = QueryDef(
    "q36_function_corpus",
    (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          upper(col("o_orderpriority")).as("up"),
          lower(col("o_orderstatus")).as("lo"),
          length(col("o_orderpriority")).as("len"),
          trim(lit("  pad  ")).as("trimmed"),
          lpad(col("o_orderkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("o_orderpriority"), "[0-9]-", "").as("cleaned"),
          substring(col("o_orderpriority"), 1, 1).as("first_ch"),
          concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("joined"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          abs(col("o_totalprice") * -1).as("abs_price"),
          round(col("o_totalprice"), 0).as("rounded"),
          floor(col("o_totalprice")).as("floored"),
          ceil(col("o_totalprice")).as("ceiled"),
          pmod(col("o_orderkey"), lit(7)).as("mod7"),
          greatest(col("o_orderkey"), col("o_custkey")).as("gr"),
          least(col("o_orderkey"), col("o_custkey")).as("ls"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
      upper(o_orderpriority) AS up, lower(o_orderstatus) AS lo,
      length(o_orderpriority) AS len, trim('  pad  ') AS trimmed,
      lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS padded,
      regexp_replace(o_orderpriority, '[0-9]-', '') AS cleaned,
      substring(o_orderpriority, 1, 1) AS first_ch,
      concat_ws('|', o_orderstatus, o_orderpriority) AS joined,
      CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
      CAST(day(o_orderdate) AS INT) AS dom,
      date_trunc('month', o_orderdate) AS month_start,
      abs(o_totalprice * -1) AS abs_price,
      round(o_totalprice, 0) AS rounded,
      CAST(floor(o_totalprice) AS BIGINT) AS floored,
      CAST(ceil(o_totalprice) AS BIGINT) AS ceiled,
      o_orderkey % 7 AS mod7,
      greatest(o_orderkey, o_custkey) AS gr, least(o_orderkey, o_custkey) AS ls
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey"""))

  // --------------------------------------------------------------------
  // q37 — multiset set operations: INTERSECT ALL / EXCEPT ALL.
  private val q37 = QueryDef(
    "q37_set_ops_all",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.intersectAll(sup).select(lit("ia").as("src"), col("nk"))
        .unionAll(c.exceptAll(sup).select(lit("ea").as("src"), col("nk")))
        .orderBy(col("src"), col("nk"))
    },
    Some("""SELECT 'ia' AS src, nk FROM (
        SELECT c_nationkey AS nk FROM customer
        INTERSECT ALL SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'ea' AS src, nk FROM (
        SELECT c_nationkey AS nk FROM customer
        EXCEPT ALL SELECT s_nationkey FROM supplier)
      ORDER BY src, nk"""))

  // --------------------------------------------------------------------
  // q38 — NATURAL JOIN over shared column names.
  private val q38 = QueryDef(
    "q38_natural_join",
    (s, dir) => {
      Tables.register(s, dir)
      s.sql("""SELECT nationkey, n_name, n_cust FROM
          (SELECT n_nationkey AS nationkey, n_name FROM nation)
        NATURAL JOIN
          (SELECT c_nationkey AS nationkey, count(*) AS n_cust
           FROM customer GROUP BY 1)
        ORDER BY nationkey""")
    },
    Some("""SELECT nationkey, n_name, n_cust FROM
        (SELECT n_nationkey AS nationkey, n_name FROM nation) a
      NATURAL JOIN
        (SELECT c_nationkey AS nationkey, count(*) AS n_cust
         FROM customer GROUP BY 1) b
      ORDER BY nationkey"""))

  // --------------------------------------------------------------------
  // q39 — recursive CTE (Spark 4 WITH RECURSIVE): generate a month
  // spine, left-join order counts per month.
  private val q39 = QueryDef(
    "q39_recursive_cte",
    (s, dir) => {
      Tables.register(s, dir)
      s.sql("""WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP_NTZ '1997-01-01 00:00:00'
          UNION ALL SELECT m + INTERVAL '1' MONTH FROM months
          WHERE m < TIMESTAMP_NTZ '1997-12-01 00:00:00')
        SELECT m, count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
        GROUP BY m ORDER BY m""")
    },
    Some("""WITH RECURSIVE months(m) AS (
        SELECT TIMESTAMP '1997-01-01 00:00:00'
        UNION ALL SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < TIMESTAMP '1997-12-01 00:00:00')
      SELECT m, count(o_orderkey) AS n_orders
      FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
      GROUP BY m ORDER BY m"""))

  // --------------------------------------------------------------------
  // q44 — positional (lower) median per group via row_number: exact and
  // deterministic in both engines, unlike interpolated percentiles
  // whose libm arithmetic differs.
  private val q44 = QueryDef(
    "q44_median_positional",
    (s, dir) => {
      // size-switched rank (Operators.rankAndCountByGroup): the window
      // path below the crossover, distributed groupedRank past it
      graft.operators.Operators.rankAndCountByGroup(
        t(s, dir, "orders").select(col("o_orderstatus"),
          col("o_totalprice"), col("o_orderkey")),
        Seq("o_orderstatus"), Seq("o_totalprice", "o_orderkey"))
        .filter(col("rn") === expr("(n + 1) div 2")) // integer division
        .select(col("o_orderstatus"), col("o_totalprice").as("median_price"),
          col("n").as("n_orders"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, o_totalprice AS median_price, n AS n_orders
      FROM (SELECT o_orderstatus, o_totalprice,
          row_number() OVER (PARTITION BY o_orderstatus
            ORDER BY o_totalprice, o_orderkey) AS rn,
          count(*) OVER (PARTITION BY o_orderstatus) AS n
        FROM orders) x
      WHERE rn = (n + 1) // 2 ORDER BY o_orderstatus"""))

  // --------------------------------------------------------------------
  // q45 — aggregation over empty input + all-NULL aggregation semantics
  // (§2.B "agg over empty input"): count=0, sum/min/max=NULL on empty;
  // sum of all-NULLs = NULL, count(col) skips NULLs.
  private val q45 = QueryDef(
    "q45_empty_and_null_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val empty = li.filter(col("l_quantity") < -1)
        .agg(count(lit(1)).as("cnt"), dsum4(col("l_quantity")).as("total"),
          max(col("l_quantity")).as("mx"))
        .select(lit("empty").as("src"), col("cnt"), col("total"), col("mx"))
      val nulls = li.limit(100)
        .select(nullif(lit(1.0), lit(1.0)).as("alln"))
        .agg(count(col("alln")).as("cnt"),
          sum(col("alln")).as("total"), max(col("alln")).as("mx"))
        .select(lit("nulls").as("src"), col("cnt"), col("total"), col("mx"))
      empty.unionByName(nulls).orderBy(col("src"))
    },
    Some("""SELECT 'empty' AS src, count(*) AS cnt,
        CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS total,
        max(l_quantity) AS mx
      FROM lineitem WHERE l_quantity < -1
      UNION ALL
      SELECT 'nulls', count(alln), sum(alln), max(alln) FROM (
        SELECT nullif(CAST(1.0 AS DOUBLE), 1.0) AS alln
        FROM lineitem LIMIT 100) x
      ORDER BY src"""))

  val defs: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09,
    q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23,
    q24, q25, q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37,
    q38, q39, q44, q45)
}
