package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Third relational batch: banded range join, correlated lateral top-k,
  * time-based RANGE window frames — the remaining join/window shapes a
  * reference user reaches for that q01-q43 don't yet pin.
  */
object Relational3 {

  type Q = (SparkSession, String) => DataFrame

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))

  // ---------------------------------------------------------------- q44
  /** Range join, banded: for every purchase, count the same user's clicks
    * in the preceding hour.
    *
    * A naive `a.ts BETWEEN b.ts - 1h AND b.ts` join has no equi-key — at
    * scale Spark would broadcast-nested-loop it. Banding restores an
    * equi-join: bucket timestamps into 1-hour bands, a click within an
    * hour of a purchase lies in the purchase's band or the one before, so
    * joining on (user_id, band ∈ {b, b-1}) bounds each row's join fan-out
    * to two bands, then the exact range predicate filters within the
    * band-matched pairs. Shuffle is on (user_id, band) — co-located,
    * skew-safe with AQE, the standard interval-join plan Spark's streaming
    * engine uses internally for stream-stream joins. */
  val rangeJoinClicks: Q = (spark, dir) => {
    import spark.implicits._
    val BandUs = 3600L * 1000000L
    val ev = Tables.load(spark, dir, "events")
      .withColumn("ts_us", unix_micros($"ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts_us".as("p_us"),
        floor($"ts_us" / BandUs).as("band"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts_us".as("c_us"),
        explode(array(floor($"ts_us" / BandUs), floor($"ts_us" / BandUs) + 1)).as("band"))
    purchases
      .join(clicks,
        $"user_id" === $"c_user" && purchases("band") === clicks("band") &&
          $"c_us" >= $"p_us" - BandUs && $"c_us" <= $"p_us",
        "left_outer")
      .groupBy($"user_id", $"purchase_id")
      .agg(count($"c_us").as("clicks_before"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchases"), sum($"clicks_before").as("clicks_before_total"))
      .orderBy($"user_id")
  }

  val rangeJoinClicksSql: String =
    """SELECT user_id, COUNT(*) AS n_purchases, CAST(SUM(clicks_before) AS BIGINT) AS clicks_before_total
      |FROM (
      |  SELECT p.user_id, p.event_id, COUNT(c.c_us) AS clicks_before
      |  FROM (SELECT user_id, event_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase') p
      |  LEFT OUTER JOIN (SELECT user_id AS c_user, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click') c
      |    ON p.user_id = c.c_user AND c.c_us >= p.p_us - 3600000000 AND c.c_us <= p.p_us
      |  GROUP BY p.user_id, p.event_id) t
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q45
  /** Correlated LATERAL top-k join: each nation's two richest customers,
    * via a correlated subquery with ORDER BY + LIMIT (Catalyst
    * decorrelates it into a ranked window join — `.explain` shows the same
    * plan a hand-written row_number filter yields, so the scale shape is a
    * single shuffle on the correlation key). */
  val lateralTopCustomers: Q = (spark, dir) => {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT n_name, c.c_name, c.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
        |  FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_name
        |  LIMIT 2) c
        |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)
  }

  val lateralTopCustomersSql: String =
    """SELECT n_name, c.c_name, c.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
      |  FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name
      |  LIMIT 2) c
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  // ---------------------------------------------------------------- q46
  /** Time-based RANGE window frame: each order's trailing-30-day customer
    * spend. RANGE frames (value-based, tie-inclusive) are a different
    * engine path from q07's ROWS frames; the frame key is integer epoch
    * days so both engines see identical arithmetic. One shuffle on
    * custkey; the frame scan is sort-local. */
  val trailingSpend: Q = (spark, dir) => {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"day".cast(LongType))
      .rangeBetween(-30L, 0L)
    Tables.load(spark, dir, "orders")
      .withColumn("day", datediff($"o_orderdate", lit("1970-01-01")))
      .withColumn("trailing_spend",
        round(sum(dec($"o_totalprice")).over(w), 2).cast(DoubleType))
      .select($"o_orderkey", $"o_custkey", $"day".cast(IntegerType).as("day"),
        $"trailing_spend")
      .orderBy($"o_orderkey")
  }

  val trailingSpendSql: String =
    """SELECT o_orderkey, o_custkey, CAST(day AS INTEGER) AS day,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY day
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS trailing_spend
      |FROM (SELECT o_orderkey, o_custkey, o_totalprice,
      |        datediff('day', DATE '1970-01-01', o_orderdate) AS day
      |      FROM orders) t
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q47
  /** Exact quartiles per order priority via `percentile` (the
    * sort-and-interpolate exact form, distinct from q27's HLL sketch and
    * q37's ntile buckets). Both engines interpolate lower + frac·(upper −
    * lower) over doubles at rank p·(n−1) — bit-identical. Exact percentile
    * shuffles all values of a group to one reducer: fine for bounded group
    * cardinality (5 priorities); an unbounded-cardinality profile would
    * use approx_percentile's mergeable sketch instead. */
  val quartiles: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        percentile($"o_totalprice", lit(0.25)).as("p25"),
        percentile($"o_totalprice", lit(0.5)).as("p50"),
        percentile($"o_totalprice", lit(0.75)).as("p75"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderpriority")
  }

  val quartilesSql: String =
    """SELECT o_orderpriority,
      |  quantile_cont(o_totalprice, 0.25) AS p25,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.75) AS p75,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q48
  /** Wide→long reshape via `Dataset.unpivot` (the MELT operator): per-
    * nation metrics unpivoted into (nation, metric, value) rows. Unpivot
    * is a zero-shuffle projection — each input row explodes into
    * #value-columns output rows map-side. */
  val unpivotMetrics: Q = (spark, dir) => {
    import spark.implicits._
    val nat = Tables.load(spark, dir, "nation").select($"n_nationkey", $"n_name")
    Tables.load(spark, dir, "customer")
      .join(nat, $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        count(lit(1)).cast(DoubleType).as("n_customers"),
        round(sum(dec($"c_acctbal")), 2).cast(DoubleType).as("total_acctbal"),
        (sum(dec($"c_acctbal")).cast(DoubleType) / count(lit(1))).as("avg_acctbal"))
      .unpivot(Array($"n_name"), "metric", "value")
      .orderBy($"n_name", $"metric")
  }

  val unpivotMetricsSql: String =
    """WITH m AS (
      |  SELECT n_name,
      |    CAST(COUNT(*) AS DOUBLE) AS n_customers,
      |    CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_acctbal,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name)
      |SELECT n_name, metric, value FROM (
      |  SELECT n_name, 'n_customers' AS metric, n_customers AS value FROM m
      |  UNION ALL SELECT n_name, 'total_acctbal', total_acctbal FROM m
      |  UNION ALL SELECT n_name, 'avg_acctbal', avg_acctbal FROM m) u
      |ORDER BY n_name, metric""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Correlated scalar subquery in the SELECT list — Catalyst decorrelates
    * it into a left-outer aggregate join (one shuffle on the correlation
    * key), the same plan a hand-written join+agg yields; no per-row
    * subquery execution. Same SQL runs on both engines. */
  val correlatedScalar: Q = (spark, dir) => {
    Tables.registerAll(spark, dir)
    spark.sql(correlatedScalarSql)
  }

  val correlatedScalarSql: String =
    """SELECT c_custkey, c_name,
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0) AS n_big_orders
      |FROM customer c
      |WHERE c_custkey <= 200
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Distinct count over a running window: distinct order priorities each
    * customer has used up to each order. Spark has no DISTINCT window
    * aggregate, so the operator composes size(collect_set() OVER w) —
    * set semantics make it order-insensitive, hence engine-portable
    * (DuckDB runs the native COUNT(DISTINCT) OVER). */
  val windowedDistinct: Q = (spark, dir) => {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"day", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "orders")
      .withColumn("day", datediff($"o_orderdate", lit("1970-01-01")))
      .withColumn("n_distinct_priorities",
        size(collect_set($"o_orderpriority").over(w)).cast(LongType))
      .select($"o_orderkey", $"o_custkey", $"n_distinct_priorities")
      .orderBy($"o_orderkey")
  }

  val windowedDistinctSql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(COUNT(DISTINCT o_orderpriority) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY datediff('day', DATE '1970-01-01', o_orderdate), o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_distinct_priorities
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Top-3 orders per priority through the custom TopKPerKey operator
    * (graft.plans): bounded per-key heaps prune each partition to ≤ k rows
    * per key BEFORE the shuffle, where the row_number window idiom (the
    * oracle's formulation) shuffles and sorts every row. Same rows out —
    * top-k is a semigroup — so the window-based oracle pins it exactly. */
  val topKCustomOperator: Q = (spark, dir) => {
    import spark.implicits._
    val base = Tables.load(spark, dir, "orders")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
    graft.plans.GraftPlans.topKPerKey(
      base,
      keyCols = Seq("o_orderpriority"),
      orderBy = Seq(("o_totalprice", true), ("o_orderkey", false)),
      k = 3)
      .orderBy($"o_orderpriority", $"o_totalprice".desc, $"o_orderkey")
  }

  val topKCustomOperatorSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q52
  /** Conditional aggregation inside a running window: each order's
    * cumulative count of URGENT-priority orders for that customer so far —
    * sum(CASE) OVER, the windowed-conditional shape (distinct from q07's
    * plain running sums and q18's groupwise CASE aggregation). */
  val windowedConditional: Q = (spark, dir) => {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"day", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "orders")
      .withColumn("day", datediff($"o_orderdate", lit("1970-01-01")))
      .withColumn("urgent_so_far",
        sum(when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L)).over(w))
      .select($"o_orderkey", $"o_custkey", $"urgent_so_far")
      .orderBy($"o_orderkey")
  }

  val windowedConditionalSql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY datediff('day', DATE '1970-01-01', o_orderdate), o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS urgent_so_far
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Deterministic stratified sampling — the reproducible train/eval
    * split a data pipeline needs where `TABLESAMPLE`/`df.sample` would
    * give engine- and partitioning-dependent rows. Membership is a pure
    * function of the key: the first 8 hex digits of md5(key) as an
    * integer, mod 10 — a ~10% Bernoulli sample that is identical on any
    * engine with md5 (the oracle recomputes it in DuckDB), stable under
    * repartitioning, and map-side-only until the final rollup (no
    * shuffle of the unsampled fact table; the filter sits on the scan).
    * Per-stratum (order status) sampled vs total counts verify the rate
    * lands near 10% everywhere. */
  val hashSample: Q = (spark, dir) => {
    import spark.implicits._
    val bucket = conv(substring(md5($"o_orderkey".cast(StringType)), 1, 8), 16, 10)
      .cast(LongType) % 10
    Tables.load(spark, dir, "orders")
      .withColumn("in_sample", (bucket === 0).cast(LongType))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_total"), sum($"in_sample").as("n_sampled"),
        sum(when($"in_sample" === 1, dec($"o_totalprice"))).cast(DoubleType)
          .as("sampled_totalprice"))
      .orderBy($"o_orderstatus")
  }

  val hashSampleSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_total,
      |  CAST(SUM(in_sample) AS BIGINT) AS n_sampled,
      |  CAST(SUM(CASE WHEN in_sample = 1
      |    THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS sampled_totalprice
      |FROM (
      |  SELECT o_orderstatus, o_totalprice,
      |    CASE WHEN ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
      |      THEN 1 ELSE 0 END AS in_sample
      |  FROM orders) t
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q59
  /** TPC-H Q16 pattern: supplier variety per part attribute, with an
    * excluded-supplier anti-join BEFORE the distinct count. Scale shape:
    * the exclusion set is dim-scale (broadcast anti-join, no fact
    * shuffle); COUNT(DISTINCT) plans as the two-phase partial-distinct
    * expansion; final top-k is TakeOrderedAndProject. */
  val supplierVariety: Q = (spark, dir) => {
    import spark.implicits._
    val excluded = Tables.load(spark, dir, "supplier")
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    val li = Tables.load(spark, dir, "lineitem")
      .join(excluded, $"l_suppkey" === $"s_suppkey", "left_anti")
    li.join(broadcast(Tables.load(spark, dir, "part")), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_size")
      .limit(20)
  }

  val supplierVarietySql: String =
    """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE NOT EXISTS (SELECT 1 FROM supplier s
      |                  WHERE s.s_acctbal < 0 AND s.s_suppkey = l.l_suppkey)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q60
  /** LAG inter-event gaps: per-customer order cadence (days between
    * consecutive orders via lag over a per-key window, rolled up to
    * count/max/mean gap). The window partitions on the natural key —
    * a hash shuffle, spill-safe sort within partitions, no global stage;
    * the gap mean is one IEEE double division of exact integers. */
  val orderGaps: Q = (spark, dir) => {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.load(spark, dir, "orders")
      .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
      .filter($"prev_date".isNotNull)
      .select($"o_custkey",
        datediff($"o_orderdate".cast(DateType), $"prev_date".cast(DateType)).as("gap_days"))
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_gaps"),
        max($"gap_days").as("max_gap_days"),
        (sum($"gap_days").cast(DoubleType) / count(lit(1)).cast(DoubleType)).as("avg_gap_days"))
      .orderBy($"o_custkey")
  }

  val orderGapsSql: String =
    """WITH gaps AS (
      |  SELECT o_custkey,
      |    CAST(date_diff('day',
      |      CAST(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey) AS DATE),
      |      CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
      |  FROM orders)
      |SELECT o_custkey, COUNT(*) AS n_gaps,
      |  MAX(gap_days) AS max_gap_days,
      |  CAST(SUM(gap_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_gap_days
      |FROM gaps WHERE gap_days IS NOT NULL
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** q61 — the TPC-H Q21 pattern (suppliers who kept orders waiting),
    * adapted to this schema: a lineitem is LATE when it ships more than
    * 60 days after its order's date; count, per supplier, the late items
    * in finished multi-supplier orders where NO OTHER supplier was also
    * late — the classic semi-join + anti-join composition over a
    * self-joined fact table, the hardest relational shape in the TPC-H
    * suite. Plan: the order-date join computes the late flag once and
    * BOTH existence probes run against that one derivation (semi: some
    * other supplier in the order; anti: some other LATE supplier), each
    * a shuffle on the order key — self-joins on the fact's own key are
    * the honest cost of this query at any scale, and they partition
    * cleanly (no broadcast of a 100 TB side, no skew beyond the order
    * key's natural fan-out). The supplier dimension broadcasts. Counts
    * only — integer-exact across engines. */
  val lateSuppliers: Q = (spark, dir) => {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    val l = Tables.load(spark, dir, "lineitem")
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate".cast(DateType) >
          date_add($"o_orderdate".cast(DateType), 60)).cast("int").as("late"))
    val base = l.filter($"late" === 1)
      .select($"l_orderkey", $"l_suppkey").distinct()
    val others = l.select($"l_orderkey".as("o_k"), $"l_suppkey".as("o_s"),
      $"late".as("o_late"))
    base
      .join(others, $"l_orderkey" === $"o_k" && $"l_suppkey" =!= $"o_s", "left_semi")
      .join(others.filter($"o_late" === 1),
        $"l_orderkey" === $"o_k" && $"l_suppkey" =!= $"o_s", "left_anti")
      .join(broadcast(Tables.load(spark, dir, "supplier")
        .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }

  val lateSuppliersSql: String =
    """WITH l AS (
      |  SELECT l.l_orderkey, l.l_suppkey,
      |    CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |      THEN 1 ELSE 0 END AS late
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderstatus = 'F'),
      |base AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE late = 1),
      |multi AS (
      |  SELECT b.* FROM base b
      |  WHERE EXISTS (SELECT 1 FROM l l2
      |      WHERE l2.l_orderkey = b.l_orderkey AND l2.l_suppkey <> b.l_suppkey)
      |    AND NOT EXISTS (SELECT 1 FROM l l3
      |      WHERE l3.l_orderkey = b.l_orderkey AND l3.l_suppkey <> b.l_suppkey
      |        AND l3.late = 1))
      |SELECT s.s_name, COUNT(*) AS numwait
      |FROM multi m JOIN supplier s ON m.l_suppkey = s.s_suppkey
      |GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 20""".stripMargin

  val queries: Map[String, Q] = Map(
    "q61_late_suppliers" -> lateSuppliers,
    "q59_supplier_variety" -> supplierVariety,
    "q60_order_gaps" -> orderGaps,
    "q53_hash_sample" -> hashSample,
    "q52_windowed_conditional" -> windowedConditional,
    "q51_topk_per_key" -> topKCustomOperator,
    "q49_correlated_scalar" -> correlatedScalar,
    "q50_windowed_distinct" -> windowedDistinct,
    "q48_unpivot" -> unpivotMetrics,
    "q47_quartiles" -> quartiles,
    "q44_range_join" -> rangeJoinClicks,
    "q45_lateral_topk" -> lateralTopCustomers,
    "q46_trailing_spend" -> trailingSpend)

  val oracles: Map[String, String] = Map(
    "q61_late_suppliers" -> lateSuppliersSql,
    "q59_supplier_variety" -> supplierVarietySql,
    "q60_order_gaps" -> orderGapsSql,
    "q53_hash_sample" -> hashSampleSql,
    "q52_windowed_conditional" -> windowedConditionalSql,
    "q51_topk_per_key" -> topKCustomOperatorSql,
    "q49_correlated_scalar" -> correlatedScalarSql,
    "q50_windowed_distinct" -> windowedDistinctSql,
    "q48_unpivot" -> unpivotMetricsSql,
    "q47_quartiles" -> quartilesSql,
    "q44_range_join" -> rangeJoinClicksSql,
    "q45_lateral_topk" -> lateralTopCustomersSql,
    "q46_trailing_spend" -> trailingSpendSql)
}
