package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The custom top-k-per-key operator: plan shape (partial heap BEFORE the
  * exchange, final after) and row-for-row parity with the row_number
  * window idiom it out-plans. */
class TopKPerKeySpec extends SparkSpec {

  test("plans partial -> exchange -> final, and matches the window idiom") {
    import spark.implicits._
    val base = Tables.load(spark, sfDir, "orders")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")

    val topk = GraftPlans.topKPerKey(base, Seq("o_orderpriority"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .orderBy($"o_orderpriority", $"o_totalprice".desc, $"o_orderkey")

    val plan = topk.queryExecution.executedPlan.toString
    val execs = "TopKPerKey \\[".r.findAllIn(plan).size
    assert(execs == 2, s"expected partial+final TopKPerKeyExec:\n$plan")
    // the partial instance (trailing `true`) must sit BELOW the key exchange
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(o_orderpriority")
    val partialIdx = plan.indexOf(", 3, true")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial heap should run before the shuffle:\n$plan")

    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = base
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3).drop("rn")
      .orderBy($"o_orderpriority", $"o_totalprice".desc, $"o_orderkey")
      .collect().map(_.toString).toSeq
    assert(topk.collect().map(_.toString).toSeq == viaWindow)
  }

  test("k larger than any group degenerates to the full input") {
    import spark.implicits._
    val base = Tables.load(spark, sfDir, "region").select($"r_regionkey", $"r_name")
    val all = GraftPlans.topKPerKey(base, Seq("r_regionkey"),
      Seq(("r_name", false)), k = 100)
    assert(all.count() == base.count())
  }

  test("empty key set takes the global top-k") {
    import spark.implicits._
    val base = Tables.load(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    val top = GraftPlans.topKPerKey(base, Seq.empty,
      Seq(("o_totalprice", true), ("o_orderkey", false)), k = 5)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .collect().map(_.getLong(0)).toSeq
    val expect = base.orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(5).collect().map(_.getLong(0)).toSeq
    assert(top == expect)
  }
}
