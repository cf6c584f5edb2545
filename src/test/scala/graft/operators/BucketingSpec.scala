package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Evidence for the co-located-join design claim: bucketing both join
  * sides by the join key lets Spark plan a SortMergeJoin with NO shuffle
  * exchange — at 100 TB this is the difference between re-shuffling the
  * fact table on every join and reading pre-partitioned buckets. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    // external tables at explicit temp paths (warehouse dir is a static
    // conf; only the catalog entries live in the in-memory session catalog)
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    Tables.load(spark, sfDir, "orders")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    Tables.load(spark, sfDir, "customer")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer").saveAsTable("b_customer")

    // disable auto-broadcast: at test scale Spark would broadcast the
    // small side; the claim under test is the big-big join path, where
    // both sides' bucket layout replaces the shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must consume bucket layout directly: the only
      // allowed exchange is the one feeding the final aggregation
      val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin")
      assert(joinPart.length >= 2, s"expected a shuffle-family join:\n$plan")
      assert(!joinPart.drop(1).mkString.contains("Exchange hashpartitioning(o_custkey") &&
        !joinPart.drop(1).mkString.contains("Exchange hashpartitioning(c_custkey"),
        s"join inputs were re-shuffled despite bucketing:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan ignored bucket layout:\n$plan")

      // and the result is the same as the unbucketed join
      val direct = Tables.load(spark, sfDir, "orders")
        .join(Tables.load(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      val bucketed = joined.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      assert(bucketed == direct)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
  }
}
