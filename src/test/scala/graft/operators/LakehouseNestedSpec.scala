package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-12 surface: nested column types through the catalog/DSv2 stack,
  * SQL date-transform partitioning (with the corrupted-manifest pruning
  * proof embedded in the entry), SQL-declared write order, and age-based
  * snapshot expiry. Each entry carries its own `require` proofs; the spec
  * pins the RESULTS against directly-computed expectations. */
class LakehouseNestedSpec extends SparkSpec {

  test("i63: struct and map columns round-trip through CREATE/INSERT/SELECT") {
    val got = LakehouseNested.nestedTable(spark, sfDir).collect()
    val want = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey")).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getInt(0) == w.getInt(0))
      assert(g.getString(1) == w.getString(1), "struct field info.name")
      assert(g.getInt(2) == w.getInt(2), "struct field info.region")
      assert(g.getLong(3) == w.getInt(2).toLong, "map value attrs['rk']")
      assert(g.getLong(4) == w.getString(1).length.toLong, "map value attrs['len']")
    }
  }

  test("delete-free struct/map scans decode through the vectorized columnar route") {
    // run the i63 entry first so the table exists (idempotent)
    LakehouseNested.nestedTable(spark, sfDir)
    val df = spark.table("graft_nst.db.docs")
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      df.queryExecution.executedPlan.toString)
    val got = df.select(col("n_nationkey"), col("info.name"), col("info.region"),
        element_at(col("attrs"), "rk"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._1)
    val want = Tables.load(spark, sfDir, "nation")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getInt(2).toLong))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("i64: SQL years() partitioning answers the 1995 range over corrupted off-year manifests") {
    val row = LakehouseNested.sqlDatePartition(spark, sfDir).head()
    val want = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate").cast("date").between("1995-01-01", "1995-12-31"))
      .agg(count(lit(1)), sum(col("o_orderkey")).cast("long")).head()
    assert(row.getLong(0) == want.getLong(0), "row count")
    assert(row.getLong(1) == want.getLong(1), "orderkey sum")
  }

  test("i65: SQL-declared write.sort-order lands disjoint sorted files") {
    val row = LakehouseNested.sqlWriteOrder(spark, sfDir).head()
    val want = Tables.load(spark, sfDir, "customer")
      .filter(col("c_custkey") <= 100)
      .agg(count(lit(1)), min("c_custkey"), max("c_custkey")).head()
    assert(row.getLong(0) == want.getLong(0))
    assert(row.getLong(1) == want.getLong(1) && row.getLong(2) == want.getLong(2))
  }

  test("i67: partitions metadata table reports per-tuple file/record counts") {
    val got = LakehouseNested.partitionsTable(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = Tables.load(spark, sfDir, "nation")
      .groupBy(col("n_regionkey")).count().collect()
      .map(r => (s"{n_regionkey_id=${r.getInt(0)}}", r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("i68: rewrite_position_delete_files compacts both delete kinds to one pos file") {
    val row = LakehouseNested.rewritePosDeletes(spark, sfDir).head()
    val nation = Tables.load(spark, sfDir, "nation")
    assert(row.getLong(0) == nation.count() - 2)
    assert(row.getString(2) == "RPD_7", "upserted key must resolve to its replacement")
    assert(row.getLong(3) == 0L, "deleted keys must stay deleted after the rewrite")
  }

  test("i69: cherrypick publishes a staged snapshot after main diverged") {
    val got = LakehouseNested.cherrypickPublish(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Tables.load(spark, sfDir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)), sum(col("n_nationkey")).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == want, "published table must hold main's interim AND audited rows")
  }

  test("i70: type widening holds an out-of-int-range key") {
    val row = LakehouseNested.typeWidening(spark, sfDir).head()
    val nation = Tables.load(spark, sfDir, "nation")
    assert(row.getLong(0) == nation.count() + 1)
    assert(row.getLong(2) == 5000000000L, "the widened column must hold the big key")
  }

  test("i71: stats-served aggregate matches the direct computation") {
    val row = LakehouseNested.statsAggregate(spark, sfDir).head()
    val want = Tables.load(spark, sfDir, "nation")
      .agg(count(lit(1)), min(col("n_nationkey")), max(col("n_nationkey")),
        max(col("n_name"))).head()
    assert(row.getLong(0) == want.getLong(0))
    assert(row.getInt(1) == want.getInt(1) && row.getInt(2) == want.getInt(2))
    assert(row.getString(3) == want.getString(3))
  }

  test("i66: expire_snapshots(older_than_ms) keeps the newest retain_last regardless of age") {
    val row = LakehouseNested.expireOlderThan(spark, sfDir).head()
    val nation = Tables.load(spark, sfDir, "nation")
    assert(row.getLong(0) == nation.count(), "all four quarter-inserts still readable")
    assert(row.getLong(1) ==
      nation.agg(sum(col("n_nationkey")).cast("long")).head().getLong(0))
  }
}
