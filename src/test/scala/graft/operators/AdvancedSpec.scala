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

  test("MisraGries merge under capacity overflow keeps the n/c undercount bound") {
    // Many skewed partitions whose merged sketches exceed capacity: the
    // shrink path (subtract the cut from survivors) must keep every
    // surviving count within [true - n/c, true], and every item with
    // frequency > n/c must survive.
    val capacity = 8
    val mg = new MisraGries(capacity)
    // deterministic skew: partition p carries heavy items h1/h2 plus its
    // own junk tail, so each pairwise merge overflows capacity
    val partitions = (0 until 12).map { p =>
      val items = Seq.fill(50)("heavy_a") ++ Seq.fill(30)("heavy_b") ++
        (1 to 10).flatMap(i => Seq.fill(1 + (p + i) % 3)(s"junk_${p}_$i"))
      items.foldLeft(mg.zero)(mg.reduce)
    }
    val truth = mutable.Map.empty[String, Long]
    (0 until 12).foreach { p =>
      truth.update("heavy_a", truth.getOrElse("heavy_a", 0L) + 50)
      truth.update("heavy_b", truth.getOrElse("heavy_b", 0L) + 30)
      (1 to 10).foreach { i =>
        val k = s"junk_${p}_$i"
        truth.update(k, truth.getOrElse(k, 0L) + 1 + (p + i) % 3)
      }
    }
    val n = truth.values.sum
    val bound = n / capacity
    val sketch = mg.finish(partitions.reduce(mg.merge))
    assert(sketch.size <= capacity)
    sketch.foreach { case (k, v) =>
      val t = truth(k)
      assert(v <= t, s"$k overcounted: sketch=$v true=$t")
      assert(t - v <= bound, s"$k undercount ${t - v} exceeds n/c=$bound")
    }
    // frequency > n/c guarantees survival
    truth.filter(_._2 > bound).keys.foreach(k => assert(sketch.contains(k), s"$k missing"))
  }

  test("pivot columns carry per-status sums that reconcile with q01 totals") {
    val rows = Advanced.pivotQuery(spark, sfDir).collect()
    assert(rows.length == 3)
    assert(rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("bloom sketch: no false negatives, low false-positive rate, SQL-resolvable") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    (0L until 1000L).toDF("k").createOrReplaceTempView("bloom_keys")
    (0L until 2000L).toDF("k").createOrReplaceTempView("bloom_probes")
    val hits = spark.sql(
      """SELECT k FROM bloom_probes
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(k)) FROM bloom_keys),
        |  xxhash64(k))""".stripMargin).collect().map(_.getLong(0)).toSet
    // every inserted key must hit (bloom has no false negatives)
    assert((0L until 1000L).forall(hits.contains))
    // false positives among the 1000 non-inserted probes stay low
    val fp = hits.count(_ >= 1000L)
    assert(fp < 50, s"false-positive count $fp")
  }
}
