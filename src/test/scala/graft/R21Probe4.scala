package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Dev utility (r21, session 2): measure what the memory sink's row WIDTH
  * costs the streaming entries — the sink collects every output row to the
  * driver, so a projection to just the columns the post-sink aggregation
  * needs cuts both the scan's ReadSchema (events.props is a fat string
  * column) and the collect volume. Variants keep the final result
  * column-identical; only the sink-side projection differs.
  */
object R21Probe4 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("r21probe4", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._

    def eventsStream(): DataFrame = {
      val physical = spark.read.parquet(s"$dir/events.parquet").schema
      graft.Tables.normalizeTs(
        spark.readStream.schema(physical).parquet(s"$dir/*events.parquet"))
    }

    def runToMemory(df: DataFrame, mode: OutputMode): DataFrame = {
      val name = "mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "4")
      val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
      val prevNd = spark.conf.get(ndKey)
      spark.conf.set(ndKey, "false")
      try {
        val q = df.writeStream.format("memory").queryName(name)
          .outputMode(mode).trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally { spark.conf.set(key, prev); spark.conf.set(ndKey, prevNd) }
      spark.table(name)
    }

    def st08(project: Boolean): DataFrame = {
      val dim = graft.Tables.load(spark, dir, "customer")
        .join(graft.Tables.load(spark, dir, "nation"),
          $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"n_name")
      val enriched0 = eventsStream()
        .join(broadcast(dim), $"user_id" === $"c_custkey")
      val enriched = if (project) enriched0.select($"n_name", $"user_id") else enriched0
      runToMemory(enriched, OutputMode.Append())
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_events"), countDistinct($"user_id").as("n_users"))
        .orderBy($"n_name")
    }

    def st05(project: Boolean): DataFrame = {
      val src0 = eventsStream()
      val src = if (project) src0.select($"user_id", $"event_type", $"ts") else src0
      val dedup = src
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
      val out = if (project) dedup.select($"event_type") else dedup
      runToMemory(out, OutputMode.Append())
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_distinct_users"))
        .orderBy($"event_type")
    }

    def st04(project: Boolean): DataFrame = {
      val ev = eventsStream()
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id".as("e_id"), $"user_id".as("e_user"), $"ts".as("e_ts"))
        .withWatermark("e_ts", "30 minutes")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
        .withWatermark("p_ts", "30 minutes")
      val joined0 = errors.join(purchases,
        $"e_user" === $"p_user" &&
          $"p_ts" >= $"e_ts" - expr("INTERVAL 1 HOUR") && $"p_ts" < $"e_ts")
      val joined = if (project) joined0.select($"e_id", $"p_ts") else joined0
      runToMemory(joined, OutputMode.Append())
        .groupBy($"e_id")
        .agg(count(lit(1)).as("n_recent_purchases"),
          max(unix_micros($"p_ts")).as("last_purchase_us"))
        .orderBy($"e_id")
    }

    def st03(project: Boolean): DataFrame = {
      val sessions0 = eventsStream()
        .withWatermark("ts", "30 minutes")
        .groupBy($"user_id", session_window($"ts", "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
      val sessions = if (project) sessions0.select($"user_id", $"n_events") else sessions0
      runToMemory(sessions, OutputMode.Complete())
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
        .orderBy($"user_id")
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "st08 cur" -> (() => st08(false)),
      "st08 proj" -> (() => st08(true)),
      "st05 cur" -> (() => st05(false)),
      "st05 proj" -> (() => st05(true)),
      "st04 cur" -> (() => st04(false)),
      "st04 proj" -> (() => st04(true)),
      "st03 cur" -> (() => st03(false)),
      "st03 proj" -> (() => st03(true)))
    SparkEntry.entry(spark).count()
    (1 to 3).foreach { round =>
      variants.foreach { case (name, q) =>
        val t0 = System.nanoTime()
        val df = q()
        val n = df.count()
        val h = df.collect().map(_.toString).mkString("|").hashCode
        println(f"PERF $name round$round ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n hash=$h")
      }
    }
    spark.stop()
  }
}
