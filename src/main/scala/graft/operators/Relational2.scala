package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Second relational batch: outer-join shapes, lateral explode, edge
  * window frames — rounding out the SURVEY.md §2.2 category coverage. */
object Relational2 {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q13-style: customer-order count distribution via left outer
    * join (customers with zero orders included). */
  val orderCountDist: Q = (spark, dir) => {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
      .filter(!$"o_orderpriority".startsWith("1"))
    cust.join(ord, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val orderCountDistSql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND NOT starts_with(o_orderpriority, '1')
      |  GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Full outer join with both-sides-nullable coalescing: order counts by
    * priority across two years where each side covers a different subset. */
  val fullOuterYears: Q = (spark, dir) => {
    import spark.implicits._
    val ord = Tables.load(spark, dir, "orders")
    val y96 = ord.filter(year($"o_orderdate") === 1996 && $"o_orderstatus" =!= "P")
      .groupBy($"o_orderpriority".as("p96")).agg(count(lit(1)).as("n_1996"))
    val y97 = ord.filter(year($"o_orderdate") === 1997 && $"o_orderstatus" =!= "F")
      .groupBy($"o_orderpriority".as("p97")).agg(count(lit(1)).as("n_1997"))
    y96.join(y97, $"p96" === $"p97", "full_outer")
      .select(coalesce($"p96", $"p97").as("priority"),
        coalesce($"n_1996", lit(0L)).as("n_1996"),
        coalesce($"n_1997", lit(0L)).as("n_1997"))
      .orderBy($"priority")
  }

  val fullOuterYearsSql: String =
    """SELECT COALESCE(p96, p97) AS priority,
      |  COALESCE(n_1996, 0) AS n_1996, COALESCE(n_1997, 0) AS n_1997
      |FROM (
      |  SELECT o_orderpriority AS p96, COUNT(*) AS n_1996 FROM orders
      |  WHERE EXTRACT(year FROM o_orderdate) = 1996 AND o_orderstatus <> 'P'
      |  GROUP BY 1) a
      |FULL OUTER JOIN (
      |  SELECT o_orderpriority AS p97, COUNT(*) AS n_1997 FROM orders
      |  WHERE EXTRACT(year FROM o_orderdate) = 1997 AND o_orderstatus <> 'F'
      |  GROUP BY 1) b
      |ON p96 = p97
      |ORDER BY priority""".stripMargin

  /** Lateral explode (generator in the select list): p_type word
    * frequencies — the UDTF-shaped surface via the built-in generator. */
  val explodeWords: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "part")
      .select($"p_partkey", explode(split($"p_type", " ")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("n_parts"), countDistinct($"p_partkey").as("n_distinct_parts"))
      .orderBy($"word")
  }

  val explodeWordsSql: String =
    """SELECT word, COUNT(*) AS n_parts, COUNT(DISTINCT p_partkey) AS n_distinct_parts
      |FROM (SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word FROM part) t
      |GROUP BY word ORDER BY word""".stripMargin

  /** Unbounded frames: first/last order per customer in one window pass
    * (first_value/last_value with full-partition frames). */
  val firstLastOrder: Q = (spark, dir) => {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(spark, dir, "orders")
      .withColumn("first_key", first($"o_orderkey").over(w))
      .withColumn("last_key", last($"o_orderkey").over(w))
      .filter($"o_orderkey" === $"first_key")
      .select($"o_custkey", $"first_key", $"last_key",
        $"o_orderdate".cast(DateType).as("first_date"))
      .orderBy($"o_custkey")
  }

  val firstLastOrderSql: String =
    """SELECT o_custkey, first_key, last_key, first_date FROM (
      |  SELECT o_custkey, o_orderkey,
      |    FIRST_VALUE(o_orderkey) OVER w AS first_key,
      |    LAST_VALUE(o_orderkey) OVER w AS last_key,
      |    CAST(FIRST_VALUE(o_orderdate) OVER w AS DATE) AS first_date
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t
      |WHERE o_orderkey = first_key
      |ORDER BY o_custkey""".stripMargin

  /** TPC-H Q4-style: order-priority counts where a qualifying lineitem
    * exists (semi join feeding an aggregation). */
  val priorityWithLate: Q = (spark, dir) => {
    import spark.implicits._
    val ord = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"o_orderdate" < lit("1996-07-01").cast(TimestampType))
    val lateItems = Tables.load(spark, dir, "lineitem")
      .filter($"l_quantity" >= 30)
      .select($"l_orderkey")
    ord.join(lateItems, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val priorityWithLateSql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 30)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q12-style: dual conditional counts per group (high/low priority
    * split per linestatus). */
  val shipmodeSplit: Q = (spark, dir) => {
    import spark.implicits._
    val ord = Tables.load(spark, dir, "orders").select($"o_orderkey", $"o_orderpriority")
    Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"l_shipdate" < lit("1997-01-01").cast(TimestampType))
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_linestatus")
      .agg(
        count(when($"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH", lit(1)))
          .as("high_line_count"),
        count(when($"o_orderpriority" =!= "1-URGENT" && $"o_orderpriority" =!= "2-HIGH", lit(1)))
          .as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  val shipmodeSplitSql: String =
    """SELECT l_linestatus,
      |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
      |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q14-style: promo revenue share — a ratio of two conditional
    * decimal sums, divided in double (bit-identical both engines). */
  val promoShare: Q = (spark, dir) => {
    import spark.implicits._
    val part = Tables.load(spark, dir, "part").select($"p_partkey", $"p_type")
    val rev = $"l_extendedprice".cast(DecimalType(12, 2)) *
      (lit(1).cast(DecimalType(4, 2)) - $"l_discount".cast(DecimalType(4, 2)))
    Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-03-01").cast(TimestampType) &&
        $"l_shipdate" < lit("1996-04-01").cast(TimestampType))
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .agg(
        (sum(when($"p_type" === "PROMO", rev).otherwise(lit(0).cast(DecimalType(12, 2)))).cast(DoubleType) * 100.0 /
          sum(rev).cast(DoubleType)).as("promo_revenue_pct"),
        count(lit(1)).as("n_items"))
  }

  val promoShareSql: String =
    """SELECT
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 100.0 /
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |    AS promo_revenue_pct,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin

  /** Funnel conversion: first signup per user, first purchase strictly
    * after it — conditional aggregation over event sequences in exact
    * integer epoch-micros. Nulls (non-converters) coalesced to -1 so the
    * compare never sorts/hashes null keys. */
  val funnel: Q = (spark, dir) => {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
    val signups = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts_us").as("first_signup_us"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts_us".as("p_ts"))
    signups
      .join(purchases, $"user_id" === $"p_user" && $"p_ts" > $"first_signup_us", "left_outer")
      .groupBy($"user_id", $"first_signup_us")
      .agg(coalesce(min($"p_ts"), lit(-1L)).as("first_purchase_after_us"))
      .withColumn("converted", $"first_purchase_after_us" =!= -1L)
      .orderBy($"user_id")
  }

  val funnelSql: String =
    """SELECT s.user_id, s.first_signup_us,
      |  COALESCE(MIN(p.p_ts), -1) AS first_purchase_after_us,
      |  COALESCE(MIN(p.p_ts), -1) <> -1 AS converted
      |FROM (SELECT user_id, MIN(epoch_us(ts)) AS first_signup_us
      |      FROM events WHERE event_type = 'signup' GROUP BY user_id) s
      |LEFT OUTER JOIN (SELECT user_id AS p_user, epoch_us(ts) AS p_ts
      |      FROM events WHERE event_type = 'purchase') p
      |  ON s.user_id = p_user AND p_ts > s.first_signup_us
      |GROUP BY s.user_id, s.first_signup_us
      |ORDER BY s.user_id""".stripMargin

  /** NTILE deciles over customer balances (deterministic via unique
    * tiebreak), rolled up to per-decile stats — WITHOUT the global
    * single-partition window a naive `ntile(10).over(orderBy(...))` costs.
    *
    * Distributed exact global rank: range-partition on the sort key +
    * local sort, then `monotonically_increasing_id`'s documented bit
    * layout (partition id in the upper 31 bits, per-partition record
    * number in the lower 33) yields (pid, local row number) with ZERO
    * extra shuffle; per-partition counts (≤ shuffle-partition rows,
    * metadata-scale) become broadcast offsets, and global rank = offset +
    * local + 1. Range partitions are ordered (AQE only coalesces adjacent
    * ranges), so the rank is exact regardless of where boundaries fall.
    * The decile is then pure arithmetic on (rank, n) replicating NTILE's
    * larger-buckets-first split — same output as the windowed form, one
    * O(n) range shuffle instead of a sort into a single task.
    *
    * CORRECTNESS INVARIANT: `sorted` is referenced twice (rows + counts);
    * both references MUST read the SAME range exchange — independent
    * evaluations could sample different range boundaries and the offsets
    * would not match the rows' pids. Spark's exchange reuse
    * (spark.sql.exchange.reuse, default on) guarantees this for identical
    * subtrees; ScaleShapeSpec asserts the ReusedExchange is present in the
    * executed plan. */
  val balanceDeciles: Q = (spark, dir) => {
    import spark.implicits._
    // The invariant above is only guaranteed while exchange reuse is on:
    // with it disabled the two consumers of `sorted` re-sample range
    // boundaries independently and ranks silently desync — refuse to build
    // a query that could be silently wrong instead of relying on a test.
    require(spark.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "balanceDeciles requires spark.sql.exchange.reuse=true: both consumers " +
        "of the range-partitioned relation must read one exchange or ranks desync")
    val sortKeys = Seq($"c_acctbal".desc, $"c_custkey")
    val sorted = Tables.load(spark, dir, "customer")
      .select($"c_acctbal", $"c_custkey")
      .repartitionByRange(sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
      .withColumn("mid", monotonically_increasing_id())
      .withColumn("pid", shiftright($"mid", 33))
      .withColumn("local_rn", $"mid".bitwiseAND(lit((1L << 33) - 1)))
    val counts = sorted.groupBy($"pid").agg(count(lit(1)).as("cnt"))
    // window over ≤ |shuffle partitions| rows — metadata-scale by
    // construction, the same shape as q47's broadcast cutpoints
    val wOff = Window.orderBy($"pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("offset", coalesce(sum($"cnt").over(wOff), lit(0L)))
      .crossJoin(counts.agg(sum($"cnt").as("n_total")))
    sorted.join(broadcast(offsets), Seq("pid"))
      .withColumn("rnk", $"offset" + $"local_rn" + 1)
      // NTILE(10): base-size buckets, the first (n % 10) buckets one larger
      .withColumn("decile", expr(
        """CAST(CASE WHEN rnk <= (n_total % 10) * (n_total DIV 10 + 1)
          |  THEN (rnk - 1) DIV (n_total DIV 10 + 1) + 1
          |  ELSE n_total % 10 + (rnk - (n_total % 10) * (n_total DIV 10 + 1) - 1)
          |         DIV (n_total DIV 10) + 1
          |END AS INT)""".stripMargin))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_customers"),
        dec10($"c_acctbal", min).as("min_bal"),
        dec10($"c_acctbal", max).as("max_bal"))
      .orderBy($"decile")
  }

  private def dec10(c: org.apache.spark.sql.Column,
      agg: org.apache.spark.sql.Column => org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    agg(c.cast(DecimalType(12, 2))).cast("double")

  val balanceDecilesSql: String =
    """SELECT CAST(decile AS INTEGER) AS decile, COUNT(*) AS n_customers,
      |  CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_bal,
      |  CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal
      |FROM (SELECT c_acctbal, NTILE(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
      |      FROM customer) t
      |GROUP BY decile ORDER BY decile""".stripMargin

  /** TPC-H Q18-style: customers whose single orders accumulate large
    * lineitem quantity (grouped-HAVING feeding an IN-style semi join). */
  val bigOrders: Q = (spark, dir) => {
    import spark.implicits._
    val bigKeys = Tables.load(spark, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum(dec2($"l_quantity")).as("total_qty"))
      .filter($"total_qty" > 150)
    val ord = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    ord.join(bigKeys, $"o_orderkey" === $"l_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey",
        $"o_orderdate".cast(DateType).as("o_orderdate"),
        $"total_qty".cast(DoubleType).as("total_qty"))
      .orderBy($"total_qty".desc, $"o_orderkey")
      .limit(20)
  }

  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))

  val bigOrdersSql: String =
    """SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  CAST(total_qty AS DOUBLE) AS total_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150) b
      |  ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q22-style: positive-balance customers above the positive-only
    * average with no 1997 orders — anti join + exact-decimal avg
    * comparison (bal·n > sum avoids engine-specific division). */
  val globalSales: Q = (spark, dir) => {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
    val positive = cust.filter($"c_acctbal" > 0.0)
    val stats = positive.agg(sum(dec2($"c_acctbal")).as("s"), count(lit(1)).as("n"))
    val ord = Tables.load(spark, dir, "orders")
      .filter(year($"o_orderdate") === 1997)
      .select($"o_custkey")
    positive.crossJoin(broadcast(stats))
      .filter(dec2($"c_acctbal") * $"n" > $"s")
      .join(ord, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_custs"),
        round(sum(dec2($"c_acctbal")), 2).cast(DoubleType).as("total_bal"))
      .orderBy($"c_mktsegment")
  }

  val globalSalesSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_custs,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_bal
      |FROM customer, (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s, COUNT(*) AS n
      |                FROM customer WHERE c_acctbal > 0.0) st
      |WHERE c_acctbal > 0.0
      |  AND CAST(c_acctbal AS DECIMAL(12,2)) * n > s
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND EXTRACT(year FROM o_orderdate) = 1997)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Multiset set operations (ALL variants keep duplicates — a different
    * physical plan from the distinct forms: aggregate-count + replicate). */
  val multisetOps: Q = (spark, dir) => {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
    val a = li.filter($"l_returnflag" === "R").select($"l_suppkey")
    val b = li.filter($"l_linestatus" === "F").select($"l_suppkey")
    val inter = a.intersectAll(b).agg(count(lit(1)).as("n_intersect_all"))
    val exc = a.exceptAll(b).agg(count(lit(1)).as("n_except_all"))
    val uni = a.union(b).agg(count(lit(1)).as("n_union_all"))
    inter.crossJoin(exc).crossJoin(uni)
  }

  val multisetOpsSql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM (
      |    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
      |    INTERSECT ALL
      |    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F')) AS n_intersect_all,
      |  (SELECT COUNT(*) FROM (
      |    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
      |    EXCEPT ALL
      |    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F')) AS n_except_all,
      |  (SELECT COUNT(*) FROM (
      |    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
      |    UNION ALL
      |    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F')) AS n_union_all""".stripMargin

  /** Null-handling + map-function battery: props JSON lifted to a real
    * map column (str_to_map), element_at/cardinality over it, and the
    * nullif/nvl/coalesce family on derived nullables. */
  val nullMapFns: Q = (spark, dir) => {
    import spark.implicits._
    val kv = str_to_map(regexp_replace($"props", "[{}\" ]", ""), lit(","), lit(":"))
    Tables.load(spark, dir, "events")
      .withColumn("kv", kv)
      .select($"event_id",
        element_at($"kv", "k").cast(IntegerType).as("k_val"),
        size($"kv").as("n_keys"),
        nullif($"event_type", lit("view")).as("type_or_null"))
      .withColumn("type_filled", coalesce($"type_or_null", lit("filtered")))
      .groupBy($"type_filled")
      .agg(count(lit(1)).as("n"),
        count($"type_or_null").as("n_nonnull"),
        sum(when($"k_val" > 50, 1).otherwise(0)).as("n_high_k"),
        max($"n_keys").as("max_keys"))
      .orderBy($"type_filled")
  }

  val nullMapFnsSql: String =
    """SELECT type_filled, COUNT(*) AS n, COUNT(type_or_null) AS n_nonnull,
      |  CAST(SUM(CASE WHEN k_val > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_k,
      |  MAX(n_keys) AS max_keys
      |FROM (
      |  SELECT event_id,
      |    CAST(map_extract(kv, 'k')[1] AS INTEGER) AS k_val,
      |    CAST(cardinality(kv) AS INTEGER) AS n_keys,
      |    NULLIF(event_type, 'view') AS type_or_null,
      |    COALESCE(NULLIF(event_type, 'view'), 'filtered') AS type_filled
      |  FROM (SELECT event_id, event_type,
      |          map_from_entries([struct_pack(k := string_split(p, ':')[1], v := string_split(p, ':')[2])
      |            for p in string_split(regexp_replace(props, '[{}" ]', '', 'g'), ',')]) AS kv
      |        FROM events) a) b
      |GROUP BY type_filled
      |ORDER BY type_filled""".stripMargin

  /** Remaining ranking-function variants in one pass: dense_rank,
    * percent_rank, cume_dist (double ratios of ints — identical IEEE
    * division both engines), lag/lead with defaults. */
  val rankVariants: Q = (spark, dir) => {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.load(spark, dir, "customer")
      .filter($"c_custkey" < 200)
      .select($"c_mktsegment", $"c_custkey",
        dense_rank().over(w).as("drank"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        lag($"c_custkey", 1, -1L).over(w).as("prev_cust"),
        lead($"c_custkey", 2, -1L).over(w).as("next2_cust"))
      .orderBy($"c_mktsegment", $"c_custkey")
  }

  val rankVariantsSql: String =
    """SELECT c_mktsegment, c_custkey,
      |  CAST(DENSE_RANK() OVER w AS INTEGER) AS drank,
      |  PERCENT_RANK() OVER w AS prank,
      |  CUME_DIST() OVER w AS cdist,
      |  LAG(c_custkey, 1, -1) OVER w AS prev_cust,
      |  LEAD(c_custkey, 2, -1) OVER w AS next2_cust
      |FROM customer
      |WHERE c_custkey < 200
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** TPC-H Q17-style: revenue from small-quantity lineitems, threshold
    * 20% of the per-part average quantity. The comparison is kept in
    * exact integer-scaled decimals (5·qty·cnt < sum ⇔ qty < 0.2·avg),
    * avoiding engine-specific division entirely.
    *
    * Plan: per-part stats come from a window over l_partkey, not a
    * separate aggregate joined back — ONE scan of the fact table and ONE
    * shuffle, where the agg+broadcast formulation scans lineitem twice and
    * broadcasts a fact-derived table (unbounded at 100 TB: |parts| grows
    * with the data, unlike a dimension table). Measured 3.5 s → window
    * form at sf0.1. */
  val smallQtyRevenue: Q = (spark, dir) => {
    import spark.implicits._
    val byPart = Window.partitionBy($"l_partkey")
    Tables.load(spark, dir, "lineitem")
      .withColumn("qty_sum", sum(dec2($"l_quantity")).over(byPart))
      .withColumn("qty_cnt", count(lit(1)).over(byPart))
      .filter(dec2($"l_quantity") * 5 * $"qty_cnt" < $"qty_sum")
      .agg(round(sum(dec2($"l_extendedprice")), 2).cast(DoubleType).as("small_qty_revenue"),
        count(lit(1)).as("n_items"))
  }

  val smallQtyRevenueSql: String =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS small_qty_revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l JOIN (
      |  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_sum, COUNT(*) AS qty_cnt
      |  FROM lineitem GROUP BY l_partkey) s
      |ON l.l_partkey = pk
      |WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * qty_cnt < qty_sum""".stripMargin

  val queries: Map[String, Q] = Map(
    "q43_small_qty_revenue" -> smallQtyRevenue,
    "q42_rank_variants" -> rankVariants,
    "q40_multiset_ops" -> multisetOps,
    "q41_null_map_fns" -> nullMapFns,
    "q38_big_orders" -> bigOrders,
    "q39_rich_inactive" -> globalSales,
    "q36_funnel" -> funnel,
    "q37_balance_deciles" -> balanceDeciles,
    "q29_order_count_dist" -> orderCountDist,
    "q30_full_outer" -> fullOuterYears,
    "q31_explode_words" -> explodeWords,
    "q32_first_last" -> firstLastOrder,
    "q33_priority_exists" -> priorityWithLate,
    "q34_priority_split" -> shipmodeSplit,
    "q35_promo_share" -> promoShare)

  val oracles: Map[String, String] = Map(
    "q43_small_qty_revenue" -> smallQtyRevenueSql,
    "q42_rank_variants" -> rankVariantsSql,
    "q40_multiset_ops" -> multisetOpsSql,
    "q41_null_map_fns" -> nullMapFnsSql,
    "q38_big_orders" -> bigOrdersSql,
    "q39_rich_inactive" -> globalSalesSql,
    "q36_funnel" -> funnelSql,
    "q37_balance_deciles" -> balanceDecilesSql,
    "q29_order_count_dist" -> orderCountDistSql,
    "q30_full_outer" -> fullOuterYearsSql,
    "q31_explode_words" -> explodeWordsSql,
    "q32_first_last" -> firstLastOrderSql,
    "q33_priority_exists" -> priorityWithLateSql,
    "q34_priority_split" -> shipmodeSplitSql,
    "q35_promo_share" -> promoShareSql)
}
