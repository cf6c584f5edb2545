package graft.operators

import graft.{SparkSpec, Tables}

/** Plan-shape assertions for the third relational batch — these operators
  * exist to pin SCALE-SAFE plans, so the tests check the plan, not just
  * the rows (rows are pinned by the DuckDB oracles). */
class Relational3Spec extends SparkSpec {

  test("q44 banded range join compiles to an equi-join, not a nested loop") {
    val df = Relational3.rangeJoinClicks(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a non-equi plan:\n$plan")
    // every purchase appears exactly once per user rollup; sanity row count
    assert(df.count() > 0)
  }

  test("q45 lateral top-k decorrelates (no per-row subquery, no cartesian)") {
    val df = Relational3.lateralTopCustomers(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"lateral stayed correlated:\n$plan")
    val rows = df.collect()
    // <= 2 customers per nation, acctbal descending within each
    rows.groupBy(_.getString(0)).values.foreach { g =>
      assert(g.length <= 2)
      val bals = g.map(_.getDouble(2))
      assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q46 trailing spend uses a RANGE frame and matches a hand rollup") {
    import org.apache.spark.sql.functions._
    val df = Relational3.trailingSpend(spark, sfDir)
    assert(df.queryExecution.optimizedPlan.toString.contains("RangeFrame"),
      df.queryExecution.optimizedPlan.toString)
    // spot-check one customer against a driver-side rollup
    val rows = df.filter(col("o_custkey") === 1).collect()
      .map(r => (r.getInt(2), r.getDouble(3)))
    val orders = Tables.load(spark, sfDir, "orders").filter(col("o_custkey") === 1)
      .withColumn("day", datediff(col("o_orderdate"), lit("1970-01-01")))
      .select(col("day"), col("o_totalprice")).collect()
      .map(r => (r.getInt(0), BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    rows.foreach { case (day, spend) =>
      val expect = orders.filter { case (d, _) => d >= day - 30 && d <= day }
        .map(_._2).sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(spend).setScale(2, BigDecimal.RoundingMode.HALF_UP) == expect,
        s"day $day: $spend vs $expect")
    }
  }

  test("t08 top words: two-shuffle plan, nonempty zipf head") {
    val df = TextPipeline.topWords(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 20)
    val freqs = rows.map(_.getLong(1))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
  }

  test("m03 frame samples: deterministic, stride-4 arithmetic holds") {
    val a = Multimodal.frameSamples(spark, sfDir).collect()
    val b = Multimodal.frameSamples(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    a.foreach { r =>
      val n = r.getInt(1); val sampled = r.getInt(2)
      assert(sampled == (n + 3) / 4, s"doc ${r.getLong(0)}: $n frames, $sampled sampled")
    }
  }
}
