package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

import graft.{SparkSpec, Tables}

/** Storage-partitioned joins: two graft tables partitioned the same way
  * on the join key must join with NO shuffle on either side — the scan
  * reports `KeyGroupedPartitioning`, Catalyst resolves the transform
  * against the catalog's function registry, and Spark aligns the two
  * scans' partitions by key tuple. At 100 TB this removes the two
  * largest exchanges in any fact-fact join. */
class SpjSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  // AQE wraps subtrees in QueryStageExec leaves — unwrap them so the
  // walk sees the actual operators
  private def all(n: SparkPlan): Seq[SparkPlan] = n match {
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      n +: all(q.plan)
    case _ => n +: n.children.flatMap(all)
  }

  private def joinNode(p: SparkPlan): Option[SparkPlan] =
    all(p).collectFirst {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
    }

  private def shuffles(p: SparkPlan): Seq[String] =
    all(p).map(_.getClass.getSimpleName).filter(_.contains("Shuffle"))

  private def withSpjConfs[T](body: => T): T = {
    val restore = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def setupCatalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-$name").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  test("bucket-partitioned tables join with zero shuffles (SPJ)") {
    setupCatalog("spjb")
    Tables.load(spark, sfDir, "orders").createOrReplaceTempView("spj_orders")
    Tables.load(spark, sfDir, "customer").createOrReplaceTempView("spj_customer")
    spark.sql("""CREATE TABLE spjb.db.ord (o_orderkey BIGINT, o_custkey BIGINT,
      o_totalprice DOUBLE) PARTITIONED BY (bucket(4, o_custkey))""")
    spark.sql("INSERT INTO spjb.db.ord SELECT o_orderkey, o_custkey, o_totalprice FROM spj_orders")
    spark.sql("""CREATE TABLE spjb.db.cust (c_custkey BIGINT, c_name STRING)
      PARTITIONED BY (bucket(4, c_custkey))""")
    spark.sql("INSERT INTO spjb.db.cust SELECT c_custkey, c_name FROM spj_customer")

    withSpjConfs {
      val df = spark.sql("""SELECT o.o_orderkey, c.c_name, o.o_totalprice
        FROM spjb.db.ord o JOIN spjb.db.cust c ON o.o_custkey = c.c_custkey""")
      val rows = df.collect()
      // correctness against the plain-parquet equivalent
      val expected = spark.sql("""SELECT o.o_orderkey, c.c_name, o.o_totalprice
        FROM spj_orders o JOIN spj_customer c ON o.o_custkey = c.c_custkey""").collect()
      assert(rows.length == expected.length)
      assert(rows.map(_.getLong(0)).sorted.sameElements(expected.map(_.getLong(0)).sorted))

      val plan = finalPlan(df)
      val join = joinNode(plan).getOrElse(fail(s"no shuffle-family join in:\n$plan"))
      assert(shuffles(join).isEmpty,
        s"SPJ must leave the join subtree shuffle-free, got ${shuffles(join)}:\n$plan")
      assert(plan.toString.contains("BatchScan"), s"expected DSv2 scans:\n$plan")
    }
  }

  test("identity-partitioned tables join shuffle-free and a mixed layout does not") {
    setupCatalog("spji")
    Tables.load(spark, sfDir, "customer").createOrReplaceTempView("spj_cust2")
    spark.sql("""CREATE TABLE spji.db.a (c_custkey BIGINT, c_nationkey BIGINT,
      c_acctbal DOUBLE) PARTITIONED BY (c_nationkey)""")
    spark.sql("INSERT INTO spji.db.a SELECT c_custkey, c_nationkey, c_acctbal FROM spj_cust2")
    spark.sql("""CREATE TABLE spji.db.b (n_key BIGINT, total DOUBLE)
      PARTITIONED BY (n_key)""")
    spark.sql("""INSERT INTO spji.db.b
      SELECT c_nationkey AS n_key, SUM(c_acctbal) AS total FROM spj_cust2 GROUP BY c_nationkey""")
    // unpartitioned control: no provable layout, the join must shuffle
    spark.sql("CREATE TABLE spji.db.flat (n_key BIGINT, x DOUBLE)")
    spark.sql("INSERT INTO spji.db.flat SELECT c_nationkey, 1.0 FROM spj_cust2")

    withSpjConfs {
      val df = spark.sql("""SELECT a.c_custkey, b.total
        FROM spji.db.a a JOIN spji.db.b b ON a.c_nationkey = b.n_key""")
      val n = df.count()
      assert(n == Tables.load(spark, sfDir, "customer").count())
      val join = joinNode(finalPlan(df)).getOrElse(fail("no join node"))
      assert(shuffles(join).isEmpty, s"identity SPJ should be shuffle-free:\n$join")

      val ctl = spark.sql("""SELECT a.c_custkey, f.x
        FROM spji.db.a a JOIN spji.db.flat f ON a.c_nationkey = f.n_key""")
      ctl.collect()
      val ctlJoin = joinNode(finalPlan(ctl)).getOrElse(fail("no control join node"))
      assert(shuffles(ctlJoin).nonEmpty,
        "control: an unpartitioned side must still shuffle — if this ever " +
          "passes shuffle-free the assertion above is vacuous")
    }
  }

  test("GROUP BY on the partition column aggregates without a shuffle") {
    setupCatalog("spja")
    Tables.load(spark, sfDir, "orders").createOrReplaceTempView("spj_orders3")
    spark.sql("""CREATE TABLE spja.db.ord (o_orderkey BIGINT, o_custkey BIGINT,
      o_totalprice DOUBLE) PARTITIONED BY (bucket(4, o_custkey))""")
    spark.sql("INSERT INTO spja.db.ord SELECT o_orderkey, o_custkey, o_totalprice FROM spj_orders3")
    withSpjConfs {
      val df = spark.sql("""SELECT o_custkey, COUNT(*) AS n, SUM(o_totalprice) AS t
        FROM spja.db.ord GROUP BY o_custkey""")
      val n = df.count()
      assert(n == spark.sql("SELECT COUNT(DISTINCT o_custkey) FROM spj_orders3").head.getLong(0))
      val plan = finalPlan(df)
      assert(shuffles(plan).isEmpty,
        s"bucket-partitioned GROUP BY o_custkey must aggregate in place:\n$plan")
    }
  }

  test("catalog-registered transform functions evaluate the spec kernels in SQL") {
    setupCatalog("spjf")
    val b = spark.sql("SELECT spjf.system.bucket(16, CAST(1234 AS BIGINT)) AS b").head.getInt(0)
    assert(b == graft.iceberg.PartitionTransforms.bucketLong(1234L, 16))
    val t = spark.sql("SELECT spjf.system.truncate(10, 'iceberg-spark') AS t").head.getString(0)
    assert(t == "iceberg-sp")
    val y = spark.sql("SELECT spjf.system.years(DATE'1995-06-15') AS y").head.getInt(0)
    assert(y == 25)
    val m = spark.sql("SELECT spjf.system.months(DATE'1971-02-01') AS m").head.getInt(0)
    assert(m == 13)
    val d = spark.sql("SELECT spjf.system.days(TIMESTAMP'1970-01-02 12:00:00') AS d").head
      .getDate(0)
    assert(d.toLocalDate == java.time.LocalDate.of(1970, 1, 2))
    val h = spark.sql("SELECT spjf.system.hours(TIMESTAMP'1970-01-02 13:00:00') AS h").head.getInt(0)
    assert(h == 37)
    // null in, null out — not an NPE
    assert(spark.sql("SELECT spjf.system.bucket(4, CAST(NULL AS BIGINT)) AS b").head.isNullAt(0))
  }
}
