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

  val queries: Map[String, Q] = Map(
    "q29_order_count_dist" -> orderCountDist,
    "q30_full_outer" -> fullOuterYears,
    "q31_explode_words" -> explodeWords,
    "q32_first_last" -> firstLastOrder)

  val oracles: Map[String, String] = Map(
    "q29_order_count_dist" -> orderCountDistSql,
    "q30_full_outer" -> fullOuterYearsSql,
    "q31_explode_words" -> explodeWordsSql,
    "q32_first_last" -> firstLastOrderSql)
}
