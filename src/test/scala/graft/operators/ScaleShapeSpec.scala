package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the round-5 scale-shape fixes: q37's deciles without a global
  * single-partition window, and d06's in-plan block-size guard. */
class ScaleShapeSpec extends SparkSpec {

  test("q61 late suppliers: existence probes stay equi-joins; the dimension broadcasts") {
    val df = Relational3.queries("q61_late_suppliers")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the <> supplier condition rides the l_orderkey equi-join as a
    // residual — a nested-loop or cartesian here would be quadratic in
    // the fact table
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
      "the semi/anti probes must join on the order key:\n" + plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"),
      "the supplier dimension must broadcast")
  }

  test("q37 deciles: no ntile window, range-partitioned rank, same answer") {
    import spark.implicits._
    val df = Relational2.balanceDeciles(spark, sfDir)
    // materialize first: exchange reuse is an AQE runtime decision and only
    // shows in the executed plan after an action
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("ntile"),
      "the global NTILE window must be gone")
    assert(plan.toLowerCase.contains("rangepartitioning"),
      "expected the distributed range-partitioned rank")
    // both references to the sorted relation must read ONE range exchange:
    // independently-sampled boundaries would desync offsets from pids
    assert(plan.contains("ReusedExchange"),
      "counts/offsets must reuse the rows' range exchange")
    // the distributed rank must reproduce the windowed NTILE exactly
    val w = Window.orderBy($"c_acctbal".desc, $"c_custkey")
    val reference = graft.Tables.load(spark, sfDir, "customer")
      .withColumn("decile", ntile(10).over(w))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_customers"),
        min($"c_acctbal".cast("decimal(12,2)")).cast("double").as("min_bal"),
        max($"c_acctbal".cast("decimal(12,2)")).cast("double").as("max_bal"))
      .orderBy($"decile")
    assert(df.collect().toSeq === reference.collect().toSeq)
  }

  test("q37 deciles refuse to build when exchange reuse is disabled") {
    // the rank's correctness RIDES on exchange reuse (both consumers of the
    // range-shuffled relation must read one exchange); with it off the
    // operator must fail loudly at build time, not desync silently
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try intercept[IllegalArgumentException] { Relational2.balanceDeciles(spark, sfDir) }
    finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("d06 block guard: bounded blocks pass rows through, oversized raise") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .toDF("vec_id", "label")
    val ok = Dedup.boundedBlocks(df, col("label"), maxBlock = 3, tag = "spec")
    assert(ok.count() === 4, "a bound that holds must not drop or alter rows")
    assert(ok.columns.toSeq === Seq("vec_id", "label"))
    val boom = intercept[Exception] {
      Dedup.boundedBlocks(df, col("label"), maxBlock = 2, tag = "spec").count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(boom).exists(_.contains("block over exact-verify bound")),
      s"expected the guard's raise_error, got: $boom")
  }
}
