package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.MisraGries

/** Operators beyond the plain relational battery: as-of join (an operator
  * Spark lacks, recomposed from union+window per the custom-operator
  * preference order — compose built-ins before writing a Strategy),
  * pivot, salted two-phase aggregation (the skew pattern), sketches and a
  * custom typed Aggregator.
  */
object Advanced {

  type Q = (SparkSession, String) => DataFrame

  /** As-of join: each 'error' event matched to the most recent
    * at-or-before 'purchase' of the same user.
    *
    * Spark has no asof-join operator; rather than a custom SparkStrategy,
    * this composes built-ins: union both sides tagged, one window sort per
    * user carrying the last purchase time forward, filter to probes. One
    * shuffle on user_id — the same cost a dedicated sort-merge asof
    * implementation would pay. Times compared in epoch-micros (ns source
    * truncates identically on both engines). The DuckDB oracle uses its
    * native ASOF JOIN — two independent implementations, one answer.
    */
  val asofJoin: Q = (spark, dir) => {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"event_type")
    val probes = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts_us", lit(0).as("tag"))
    val sources = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us", lit(1).as("tag"))
    // at equal timestamps the source sorts first (>= asof semantics)
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts_us", $"tag".desc, $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probes.union(sources)
      .withColumn("last_purchase_us",
        max(when($"tag" === 1, $"ts_us")).over(w))
      .filter($"tag" === 0 && $"last_purchase_us".isNotNull)
      .select($"event_id", $"user_id", $"ts_us", $"last_purchase_us")
      .orderBy($"event_id")
  }

  val asofJoinSql: String =
    """SELECT e.event_id, e.user_id, e.ts_us, p.ts_us AS last_purchase_us
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'error') e
      |ASOF JOIN (SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id AND e.ts_us >= p.ts_us
      |ORDER BY event_id""".stripMargin

  /** Pivot (the DataFrame .pivot API with explicit values — no extra scan
    * to discover them, which matters when the fact table is 100 TB). */
  val pivotQuery: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum($"l_quantity".cast(DecimalType(12, 2))), 2).cast(DoubleType))
      .orderBy($"l_returnflag")
  }

  val pivotSql: String =
    """SELECT l_returnflag,
      |  CAST(ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS F,
      |  CAST(ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS O
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Salted two-phase aggregation — the hot-key mitigation at 100 TB:
    * phase 1 aggregates on (key, salt) spreading any skewed key over 16
    * reducers; phase 2 merges the partials. Decimal sums are
    * order-independent, so the result is identical to the direct plan and
    * the oracle is the plain aggregation. */
  val saltedAgg: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .withColumn("salt", pmod(hash($"l_orderkey"), lit(16)))
      .groupBy($"l_returnflag", $"salt")
      .agg(sum($"l_quantity".cast(DecimalType(12, 2))).as("partial_qty"),
        count(lit(1)).as("partial_n"))
      .groupBy($"l_returnflag")
      .agg(round(sum($"partial_qty"), 2).cast(DoubleType).as("sum_qty"),
        sum($"partial_n").as("n_items"))
      .orderBy($"l_returnflag")
  }

  val saltedAggSql: String =
    """SELECT l_returnflag,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_items
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Cardinality sketches: HLL++ approx distinct vs exact, with relative
    * error. Rows-only gate (sketch internals are engine-specific); the
    * <2% error bound is asserted in ScalaTest. */
  val approxDistinct: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"))
      .withColumn("rel_error",
        abs($"approx_parts" - $"exact_parts").cast(DoubleType) / $"exact_parts")
      .orderBy($"l_returnflag")
  }

  /** Custom typed Aggregator (Misra-Gries): with capacity ≥ #distinct the
    * sketch degrades to an exact counter, so this IS oracle-checkable —
    * the UDAF machinery (partial sketch per partition + merge) is what's
    * under test. */
  val heavyHitters: Q = (spark, dir) => {
    import spark.implicits._
    val mg = udaf(new MisraGries(64))
    Tables.load(spark, dir, "events")
      .select($"event_type")
      .agg(mg($"event_type").as("sketch"))
      .select(explode($"sketch"))
      .toDF("event_type", "n_events")
      .orderBy($"n_events".desc, $"event_type")
  }

  val heavyHittersSql: String =
    """SELECT event_type, COUNT(*) AS n_events
      |FROM events GROUP BY event_type
      |ORDER BY n_events DESC, event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q24_asof_join" -> asofJoin,
    "q25_pivot" -> pivotQuery,
    "q26_salted_agg" -> saltedAgg,
    "q27_approx_distinct" -> approxDistinct,
    "q28_heavy_hitters" -> heavyHitters)

  val oracles: Map[String, String] = Map(
    "q24_asof_join" -> asofJoinSql,
    "q25_pivot" -> pivotSql,
    "q26_salted_agg" -> saltedAggSql,
    "q28_heavy_hitters" -> heavyHittersSql)
}
