package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Storage-partitioned joins (SPJ) through the SQL catalog: two tables
  * `PARTITIONED BY (bucket(n, key))` on the join key join with NO
  * shuffle on either side. The DSv2 scan reports its layout as
  * `KeyGroupedPartitioning(bucket(n, key))` (per-file tuples derived
  * from the manifest-list field-507 summaries), Catalyst resolves the
  * `bucket` transform against the catalog's `FunctionCatalog`
  * ([[graft.sources.GraftFunctions]]), and Spark's SPJ machinery aligns
  * the two scans' partitions by key tuple.
  *
  * This is the round-13 100 TB headline: in a fact⋈fact join the two
  * join-key exchanges dominate the stage graph — a 100 TB orders ⋈
  * lineitem repartitions BOTH tables over the network before the first
  * output row. With both tables bucket-partitioned at write time, the
  * join streams co-located splits directly; the only shuffle left in
  * the plan below is the small post-join rollup.
  *
  * The entry REQUIRES the shuffle-free join subtree before returning —
  * a regression to shuffling sides fails correctness, not just bench. */
object StoragePartitioned {

  import LakehouseExec.entryDir

  /** Is there a shuffle-family join whose subtree plans without any
    * shuffle? (AQE stages unwrapped.) Evaluated on the EXECUTED plan. */
  private def joinIsShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    def all(n: SparkPlan): Seq[SparkPlan] = n match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => n +: all(q.plan)
      case _ => n +: n.children.flatMap(all)
    }
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    all(root).collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.exists(j => !all(j).exists(_.getClass.getSimpleName.contains("Shuffle")))
  }

  /** i81: orders ⋈ customer, both bucket(8)-partitioned on custkey —
    * joined under SPJ confs with broadcast disabled (the big-big shape),
    * shuffle-free-join REQUIRED, then rolled up to a stable aggregate
    * the oracle recomputes over the raw parquet. The result is collected
    * under the SPJ confs and re-wrapped so restoring session confs can
    * never re-plan it. */
  def spjJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val wh = entryDir("i81", sfDir)
    spark.conf.set("spark.sql.catalog.graft_spj",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_spj.warehouse", wh)
    Tables.load(spark, sfDir, "orders").createOrReplaceTempView("i81_orders_src")
    Tables.load(spark, sfDir, "customer").createOrReplaceTempView("i81_customer_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql("""CREATE TABLE graft_spj.db.ord
        (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
        PARTITIONED BY (bucket(8, o_custkey))""")
      spark.sql("""INSERT INTO graft_spj.db.ord
        SELECT o_orderkey, o_custkey, o_totalprice FROM i81_orders_src""")
      spark.sql("""CREATE TABLE graft_spj.db.cust
        (c_custkey BIGINT, c_nationkey BIGINT)
        PARTITIONED BY (bucket(8, c_custkey))""")
      spark.sql("""INSERT INTO graft_spj.db.cust
        SELECT c_custkey, c_nationkey FROM i81_customer_src""")
    }
    val restore = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql("""SELECT c.c_nationkey AS nation, COUNT(*) AS n_orders,
          CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18, 2))), 2) AS DOUBLE) AS total
        FROM graft_spj.db.ord o JOIN graft_spj.db.cust c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey""")
      val rows = df.collect()
      require(joinIsShuffleFree(df),
        "expected a storage-partitioned join: the join subtree must plan " +
          s"without shuffles\n${df.queryExecution.executedPlan}")
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), df.schema)
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  val spjJoinSql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nation, COUNT(*) AS n_orders,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18, 2))), 2) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "i81_spj_join" -> spjJoin)

  val oracles: Map[String, String] = Map(
    "i81_spj_join" -> spjJoinSql)
}
