package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet testdata (see /root/repo/TESTDATA.md).
  *
  * All reads go through `spark.read.parquet`, so Catalyst predicate pushdown,
  * column pruning and partition pruning apply automatically; at 100 TB these
  * would be partitioned/bucketed tables behind the same call sites.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark reads only as a raw
    // nanosecond long (spark.sql.legacy.parquet.nanosAsLong). Convert to
    // Spark's micros TimestampType with exact integer division — float
    // division would lose precision above 2^53 ns.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Registers every testdata table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
