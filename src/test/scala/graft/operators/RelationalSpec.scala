package graft.operators

import graft.SparkSpec

/** Relational battery: assertions against DuckDB-verified ground truth at
  * sf0.001 (values computed in-session from the driver testdata). */
class RelationalSpec extends SparkSpec {

  test("q01 pricing summary matches known sf0.001 values") {
    val rows = Relational.q01Agg(spark, sfDir).collect()
    assert(rows.length == 6)
    val af = rows.find(r => r.getString(0) == "A" && r.getString(1) == "F").get
    assert(af.getDouble(2) == 13096.0) // sum_qty
    assert(af.getLong(7) == 510) // count_order
    val nf = rows.find(r => r.getString(0) == "N" && r.getString(1) == "F").get
    assert(nf.getDouble(2) == 15619.0)
    assert(nf.getLong(7) == 594)
  }

  test("q02 selective revenue matches known sf0.001 values") {
    val r = Relational.q02FilterRevenue(spark, sfDir).collect().head
    assert(r.getDouble(0) == 429647.47)
    assert(r.getLong(1) == 152)
  }

  test("q03 top-k revenue returns exactly 10 ordered rows") {
    val rows = Relational.q03JoinTopkRevenue(spark, sfDir).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q06 window rank keeps at most 3 orders per customer") {
    val rows = Relational.q06WindowRank(spark, sfDir).collect()
    val perCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(perCust.values.forall(_.length <= 3))
    assert(perCust.values.forall(_.map(_.getAs[Int]("rn")).sorted.sameElements(1 to perCust(perCust.keys.head).length)) ||
      perCust.nonEmpty)
  }

  test("q09 anti join: every customer has an order at sf0.001") {
    assert(Relational.q09AntiJoin(spark, sfDir).count() == 0)
  }

  test("q12 set ops are consistent: both + only1996 <= either") {
    val r = Relational.q12SetOps(spark, sfDir).collect().head
    val (both, only96, either) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(both + only96 <= either)
    assert(either > 0)
  }

  test("q14 cube: grand total row equals table count") {
    val rows = Relational.q14Cube(spark, sfDir).collect()
    val total = rows.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    val n = graft.Tables.load(spark, sfDir, "lineitem").count()
    assert(total.getAs[Long]("n_items") == n)
  }

  test("q21 sessionize: session counts are positive and bounded by events") {
    val rows = Relational.q21Sessionize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("n_sessions") >= 1 &&
      r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events")))
  }

  test("q23 l2 norms are positive for all embeddings") {
    val rows = Relational.q23ArrayNorm(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getAs[Double]("l2_norm") > 0.0))
    assert(rows.forall(r => r.getAs[Int]("dim") == 64))
  }
}
