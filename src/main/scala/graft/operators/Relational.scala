package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** The relational analytics surface: scans, filters, joins, aggregations,
  * windows, set ops, rollup/cube/grouping-sets, string/date/json/array
  * functions — the general query capabilities the north star demands
  * (SURVEY.md §2.2). The reference itself has none of these (verified in
  * SURVEY.md §2.1: it is a manifest→JSON decoder), so every query here maps
  * onto Spark built-ins and is written to be Catalyst-friendly: filters and
  * projections sit directly on the parquet scan (pushdown + pruning), small
  * dimension tables are broadcast explicitly, and every aggregate is
  * partial-aggregation-compatible (no driver-side loops anywhere).
  *
  * Determinism contract with the DuckDB oracle (driver correctness gate):
  *   - money math in DECIMAL (exact, summation-order-independent), rounded
  *     while still decimal, then cast to double;
  *   - averages emitted as exact-decimal-sum cast to double, divided by
  *     count — IEEE division is bit-identical across engines — and never
  *     rounded afterwards (round(double) differs between engines near
  *     representation boundaries);
  *   - every query ends with a total ORDER BY over unique keys;
  *   - no null sort keys (Spark sorts nulls first, DuckDB last).
  */
object Relational {

  private def dec(c: Column, p: Int = 12, s: Int = 2): Column =
    c.cast(DecimalType(p, s))

  /** ROUND on the decimal (HALF_UP in both engines), then to double. */
  private def money(c: Column): Column = round(c, 2).cast(DoubleType)

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-style pricing summary: the canonical partial-agg groupBy. */
  val q01Agg: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        money(sum(dec($"l_quantity"))).as("sum_qty"),
        money(sum(dec($"l_extendedprice"))).as("sum_base_price"),
        money(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(4, 2)) - dec($"l_discount", 4, 2)))).as("sum_disc_price"),
        (sum(dec($"l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(dec($"l_extendedprice")).cast(DoubleType) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** TPC-H Q6-style selective scan: predicate fully pushed to parquet. */
  val q02FilterRevenue: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"l_shipdate" < lit("1997-01-01").cast(TimestampType) &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(money(sum(dec($"l_extendedprice") * dec($"l_discount", 4, 2))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q02Sql: String =
    """SELECT
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q03
  /** TPC-H Q3-style shipping priority: 3-way join + agg + top-k.
    * customer is the small side of its join (broadcast); the
    * lineitem⋈orders join shuffles on the order key — the natural
    * co-partitioning at 100 TB (bucket both by orderkey to remove it).
    */
  val q03JoinTopkRevenue: Q = (spark, dir) => {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" < lit("1998-01-01").cast(TimestampType))
    val li = Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" > lit("1996-06-30").cast(TimestampType))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(money(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(4, 2)) - dec($"l_discount", 4, 2)))).as("revenue"))
      .select($"o_orderkey", $"o_orderdate".cast(DateType).as("o_orderdate"), $"o_orderpriority", $"revenue")
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  val q03Sql: String =
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1996-06-30'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Star-schema dimension rollup: two explicit broadcast joins — zero
    * shuffle on the fact side until the final small aggregation. */
  val q04BroadcastDims: Q = (spark, dir) => {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    cust.join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"),
        money(sum(dec($"c_acctbal"))).as("total_acctbal"))
      .orderBy($"r_name", $"n_name")
  }

  val q04Sql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q05
  /** TPC-H Q5-style local-supplier volume: 5-way join. Dimensions
    * broadcast; the two fact-fact joins shuffle on their keys. */
  val q05MultiJoin: Q = (spark, dir) => {
    import spark.implicits._
    val region = Tables.load(spark, dir, "region").filter($"r_name" === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"o_orderdate" < lit("1997-01-01").cast(TimestampType))
    val li = Tables.load(spark, dir, "lineitem")
    val supp = Tables.load(spark, dir, "supplier")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(cust, $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(money(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(4, 2)) - dec($"l_discount", 4, 2)))).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q05Sql: String =
    """SELECT n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Window rank: top-3 orders per customer. One shuffle on the window
    * partition key; rank filter evaluated inside the window stage. */
  val q06WindowRank: Q = (spark, dir) => {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.load(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey",
        dec($"o_totalprice").cast(DoubleType).as("o_totalprice"))
      .orderBy($"o_custkey", $"rn")
  }

  val q06Sql: String =
    """SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Running-total window over an explicit rows frame. */
  val q07WindowRunning: Q = (spark, dir) => {
    import spark.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "lineitem")
      .filter($"l_suppkey" < 20)
      .withColumn("running_qty", sum(dec($"l_quantity")).over(w))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        $"l_shipdate".cast(DateType).as("ship_date"),
        money($"running_qty").as("running_qty"))
      .orderBy($"l_suppkey", $"ship_date", $"l_orderkey", $"l_linenumber")
  }

  val q07Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_qty
      |FROM lineitem
      |WHERE l_suppkey < 20
      |ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Existential join (EXISTS) as a left-semi join — no row duplication,
    * the build side carries keys only. */
  val q08SemiJoin: Q = (spark, dir) => {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
    val openOrders = Tables.load(spark, dir, "orders").filter($"o_orderstatus" === "O")
    cust.join(openOrders, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val q08Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q09
  /** NOT EXISTS as a left-anti join. */
  val q09AntiJoin: Q = (spark, dir) => {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", money(dec($"c_acctbal")).as("c_acctbal"))
      .orderBy($"c_custkey")
  }

  val q09Sql: String =
    """SELECT c_custkey, c_name, CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,2)), 2) AS DOUBLE) AS c_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Top-k: orderBy+limit compiles to TakeOrderedAndProject — per-partition
    * heaps, no global sort, no full shuffle. */
  val q10Topk: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey",
        dec($"o_totalprice").cast(DoubleType).as("o_totalprice"),
        $"o_orderdate".cast(DateType).as("o_orderdate"))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  val q10Sql: String =
    """SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
      |  CAST(o_orderdate AS DATE) AS o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Distinct aggregation: per-supplier distinct part count (expands to a
    * two-phase partial/final distinct-agg plan). */
  val q11DistinctCounts: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .groupBy($"l_suppkey")
      .agg(countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_orderkey").as("n_orders"),
        count(lit(1)).as("n_items"))
      .orderBy($"l_suppkey")
  }

  val q11Sql: String =
    """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(*) AS n_items
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Set operations: INTERSECT / EXCEPT / UNION (distinct semantics in both
    * engines) over customer key sets from two order-date ranges. */
  val q12SetOps: Q = (spark, dir) => {
    import spark.implicits._
    val ord = Tables.load(spark, dir, "orders")
    val a = ord.filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
      $"o_orderdate" < lit("1997-01-01").cast(TimestampType)).select($"o_custkey")
    val b = ord.filter($"o_orderdate" >= lit("1997-01-01").cast(TimestampType) &&
      $"o_orderdate" < lit("1998-01-01").cast(TimestampType)).select($"o_custkey")
    val both = a.intersect(b).agg(count(lit(1)).as("n_both"))
    val onlyA = a.except(b).agg(count(lit(1)).as("n_only_1996"))
    val either = a.union(b).distinct().agg(count(lit(1)).as("n_either"))
    both.crossJoin(onlyA).crossJoin(either)
  }

  val q12Sql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM (
      |     SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |     INTERSECT
      |     SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')) AS n_both,
      |  (SELECT COUNT(*) FROM (
      |     SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |     EXCEPT
      |     SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')) AS n_only_1996,
      |  (SELECT COUNT(*) FROM (
      |     SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |     UNION
      |     SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')) AS n_either""".stripMargin

  // ---------------------------------------------------------------- q13
  /** ROLLUP over the region→nation hierarchy. Group keys coalesced so
    * neither engine emits null sort keys. */
  val q13Rollup: Q = (spark, dir) => {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    cust.join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"),
        money(sum(dec($"c_acctbal"))).as("total_acctbal"))
      .select(coalesce($"r_name", lit("ALL")).as("region"),
        coalesce($"n_name", lit("ALL")).as("nation"),
        $"n_customers", $"total_acctbal")
      .orderBy($"region", $"nation")
  }

  val q13Sql: String =
    """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
      |  COUNT(*) AS n_customers,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  // ---------------------------------------------------------------- q14
  /** CUBE over two low-cardinality flags. */
  val q14Cube: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(money(sum(dec($"l_quantity"))).as("sum_qty"), count(lit(1)).as("n_items"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"sum_qty", $"n_items")
      .orderBy($"returnflag", $"linestatus")
  }

  val q14Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Explicit GROUPING SETS (via SQL — the canonical Spark surface). */
  val q15GroupingSets: Q = (spark, dir) => {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  val q15Sql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n_orders,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin

  // ---------------------------------------------------------------- q16
  /** String-function battery: upper/substring/length/replace/regexp/concat
    * — all codegen'd builtins, evaluated inside the scan stage. */
  val q16StringFns: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "part")
      .filter($"p_name".like("%a%"))
      .select(
        $"p_partkey",
        upper($"p_brand").as("brand_upper"),
        regexp_extract($"p_brand", "#(\\d+)", 1).cast(IntegerType).as("brand_num"),
        substring($"p_type", 1, 4).as("type_prefix"),
        length($"p_name").as("name_len"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        regexp_replace($"p_name", "[aeiou]", "").as("name_novowels"))
      .orderBy($"p_partkey")
  }

  val q16Sql: String =
    """SELECT p_partkey, UPPER(p_brand) AS brand_upper,
      |  CAST(regexp_extract(p_brand, '#(\d+)', 1) AS INTEGER) AS brand_num,
      |  SUBSTRING(p_type, 1, 4) AS type_prefix,
      |  CAST(LENGTH(p_name) AS INTEGER) AS name_len,
      |  CONCAT_WS('|', p_brand, p_type) AS brand_type,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels
      |FROM part
      |WHERE p_name LIKE '%a%'
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Date-function battery: year/month/quarter extraction + monthly agg. */
  val q17DateFns: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .groupBy(year($"o_orderdate").as("o_year"),
        quarter($"o_orderdate").as("o_quarter"),
        month($"o_orderdate").as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        money(sum(dec($"o_totalprice", 14, 2))).as("total_price"))
      .orderBy($"o_year", $"o_quarter", $"o_month")
  }

  val q17Sql: String =
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
      |  CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS o_quarter,
      |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS o_month,
      |  COUNT(*) AS n_orders,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY 1, 2, 3
      |ORDER BY o_year, o_quarter, o_month""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Conditional aggregation (pivot-by-CASE): single scan, no joins. */
  val q18CaseAgg: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .groupBy($"l_linestatus")
      .agg(
        money(sum(when($"l_returnflag" === "R", dec($"l_quantity")).otherwise(lit(0).cast(DecimalType(12, 2))))).as("qty_returned"),
        money(sum(when($"l_returnflag" === "A", dec($"l_quantity")).otherwise(lit(0).cast(DecimalType(12, 2))))).as("qty_accepted"),
        money(sum(when($"l_returnflag" === "N", dec($"l_quantity")).otherwise(lit(0).cast(DecimalType(12, 2))))).as("qty_none"),
        count(when($"l_discount" > 0.05, lit(1))).as("n_discounted"))
      .orderBy($"l_linestatus")
  }

  val q18Sql: String =
    """SELECT l_linestatus,
      |  CAST(ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS qty_returned,
      |  CAST(ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS qty_accepted,
      |  CAST(ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS qty_none,
      |  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Semi-structured extraction: pull an int out of the JSON props column
    * with a regexp (codegen'd; no UDF) and aggregate by derived bucket. */
  val q19JsonExtract: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .withColumn("k", regexp_extract($"props", "\"k\": (\\d+)", 1).cast(IntegerType))
      .groupBy(($"k" % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n_events"),
        money(sum(dec($"value"))).as("total_value"),
        (sum(dec($"value")).cast(DoubleType) / count(lit(1))).as("avg_value"))
      .orderBy($"k_bucket")
  }

  val q19Sql: String =
    """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) % 10 AS k_bucket,
      |  COUNT(*) AS n_events,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value
      |FROM events
      |GROUP BY 1
      |ORDER BY k_bucket""".stripMargin

  // ---------------------------------------------------------------- q20
  /** Time-bucketed event aggregation (the batch twin of the streaming
    * tumbling window). Hour emitted as a string: the events timestamps are
    * nanosecond-precision and Spark truncates to micros on read, so raw
    * timestamp output would diverge from DuckDB's ns values. */
  val q20EventsHourly: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy(date_format($"ts", "yyyy-MM-dd HH:00:00").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        money(sum(dec($"value"))).as("total_value"))
      .orderBy($"hour", $"event_type")
  }

  val q20Sql: String =
    """SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS hour, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Sessionization: lag + cumulative flag-sum windows, 30-minute gap.
    * Gaps compared in integer epoch-micros so both engines see identical
    * values despite the ns→µs truncation on the Spark side. */
  val q21Sessionize: Q = (spark, dir) => {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    Tables.load(spark, dir, "events")
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("prev_us", lag($"ts_us", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_us".isNull || $"ts_us" - $"prev_us" > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id")
      .agg(max($"session_id").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  val q21Sql: String =
    """SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      |FROM (
      |  SELECT user_id,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM (
      |    SELECT user_id, event_id, ts_us,
      |      CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
      |    FROM (
      |      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |        LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |      FROM events) a) b) c
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q22
  /** "Above the nation average" — decorrelated into an aggregate + join.
    * The comparison is done in exact integer-scaled decimal math
    * (bal * count > sum) so no engine-dependent division is involved. */
  val q22AboveAvg: Q = (spark, dir) => {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
    val stats = cust.groupBy($"c_nationkey".as("nk"))
      .agg(sum(dec($"c_acctbal")).as("sum_bal"), count(lit(1)).as("cnt"))
    cust.join(broadcast(stats), $"c_nationkey" === $"nk")
      .filter(dec($"c_acctbal") * $"cnt" > $"sum_bal")
      .select($"c_custkey", $"c_name", $"c_nationkey",
        dec($"c_acctbal").cast(DoubleType).as("c_acctbal"))
      .orderBy($"c_custkey")
  }

  val q22Sql: String =
    """SELECT c_custkey, c_name, c_nationkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS c_acctbal
      |FROM customer JOIN (
      |  SELECT c_nationkey AS nk, SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_bal, COUNT(*) AS cnt
      |  FROM customer GROUP BY c_nationkey) s
      |ON c_nationkey = nk
      |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * cnt > sum_bal
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Array-function battery over the embedding column: element count and
    * L2 norm via higher-order functions (aggregate/transform — codegen'd,
    * no UDF). The norm is an unrounded double: both engines fold the same
    * 64 doubles left-to-right, so the result is bit-identical. */
  val q23ArrayNorm: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"label",
        size($"embedding").as("dim"),
        sqrt(aggregate(transform($"embedding", x => x.cast(DoubleType) * x.cast(DoubleType)),
          lit(0.0), (acc, x) => acc + x)).as("l2_norm"))
      .orderBy($"vec_id")
  }

  val q23Sql: String =
    """SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS dim,
      |  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS l2_norm
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  // -------------------------------------------------------------- registry

  // ---------------------------------------------------------------- q57
  /** TPC-H Q19 pattern: disjunction of conjunctive brand/size/quantity
    * arms over a part⋈lineitem join. The OR-of-ANDs is the canonical
    * "can the optimizer still push and prune?" predicate: Catalyst
    * extracts the common `l_quantity < 35` / `p_size >= 1` bounds, pushes
    * the part-side conjuncts below the join, and the dimension side
    * broadcasts — the fact table is filtered in its scan stage, never
    * shuffled. Revenue in DECIMAL per the money conventions. */
  val q57DisjunctiveFilter: Q = (spark, dir) => {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
    val pt = Tables.load(spark, dir, "part")
    li.join(broadcast(pt), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) && $"l_quantity" < 15) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) && $"l_quantity" < 25) ||
          ($"p_brand" === "Brand#16" && $"p_size".between(1, 15) && $"l_quantity" < 35))
      .agg(
        money(sum(dec($"l_extendedprice") *
          (lit(BigDecimal(1)).cast(DecimalType(4, 2)) - dec($"l_discount", 4, 2)))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q57Sql: String =
    """SELECT
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity < 15)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity < 25)
      |   OR (p_brand = 'Brand#16' AND p_size BETWEEN 1 AND 15 AND l_quantity < 35)""".stripMargin

  val queries: Map[String, Q] = Map(
    "q01_agg" -> q01Agg,
    "q02_filter_revenue" -> q02FilterRevenue,
    "q03_join_topk" -> q03JoinTopkRevenue,
    "q04_broadcast_dims" -> q04BroadcastDims,
    "q05_multi_join" -> q05MultiJoin,
    "q06_window_rank" -> q06WindowRank,
    "q07_window_running" -> q07WindowRunning,
    "q08_semi_join" -> q08SemiJoin,
    "q09_anti_join" -> q09AntiJoin,
    "q10_topk" -> q10Topk,
    "q11_distinct_counts" -> q11DistinctCounts,
    "q12_setops" -> q12SetOps,
    "q13_rollup" -> q13Rollup,
    "q14_cube" -> q14Cube,
    "q15_grouping_sets" -> q15GroupingSets,
    "q16_string_fns" -> q16StringFns,
    "q17_date_fns" -> q17DateFns,
    "q18_case_agg" -> q18CaseAgg,
    "q19_json_extract" -> q19JsonExtract,
    "q20_events_hourly" -> q20EventsHourly,
    "q21_sessionize" -> q21Sessionize,
    "q22_above_avg" -> q22AboveAvg,
    "q23_array_norm" -> q23ArrayNorm,
    "q57_disjunctive_filter" -> q57DisjunctiveFilter)

  val oracles: Map[String, String] = Map(
    "q57_disjunctive_filter" -> q57Sql,
    "q01_agg" -> q01Sql,
    "q02_filter_revenue" -> q02Sql,
    "q03_join_topk" -> q03Sql,
    "q04_broadcast_dims" -> q04Sql,
    "q05_multi_join" -> q05Sql,
    "q06_window_rank" -> q06Sql,
    "q07_window_running" -> q07Sql,
    "q08_semi_join" -> q08Sql,
    "q09_anti_join" -> q09Sql,
    "q10_topk" -> q10Sql,
    "q11_distinct_counts" -> q11Sql,
    "q12_setops" -> q12Sql,
    "q13_rollup" -> q13Sql,
    "q14_cube" -> q14Sql,
    "q15_grouping_sets" -> q15Sql,
    "q16_string_fns" -> q16Sql,
    "q17_date_fns" -> q17Sql,
    "q18_case_agg" -> q18Sql,
    "q19_json_extract" -> q19Sql,
    "q20_events_hourly" -> q20Sql,
    "q21_sessionize" -> q21Sql,
    "q22_above_avg" -> q22Sql,
    "q23_array_norm" -> q23Sql)
}
