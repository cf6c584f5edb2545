package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Dev utility (r21): attribute the streaming entries' fixed costs —
  * two-source vs single-source stream-stream join, and state-store
  * partition count — in one warm session. */
object R21StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("r21stream", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._

    def eventsStream(): DataFrame = {
      val physical = spark.read.parquet(s"$dir/events.parquet").schema
      graft.Tables.normalizeTs(
        spark.readStream.schema(physical).parquet(s"$dir/*events.parquet"))
    }

    def runToMemory(df: DataFrame, mode: OutputMode, parts: String): DataFrame = {
      val name = "mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, parts)
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

    def st04(singleSource: Boolean, parts: String): DataFrame = {
      val (se, sp) = if (singleSource) { val s = eventsStream(); (s, s) }
        else (eventsStream(), eventsStream())
      val errors = se.filter($"event_type" === "error")
        .select($"event_id".as("e_id"), $"user_id".as("e_user"), $"ts".as("e_ts"))
        .withWatermark("e_ts", "30 minutes")
      val purchases = sp.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
        .withWatermark("p_ts", "30 minutes")
      val joined = errors.join(purchases,
        $"e_user" === $"p_user" &&
          $"p_ts" >= $"e_ts" - expr("INTERVAL 1 HOUR") && $"p_ts" < $"e_ts")
      runToMemory(joined, OutputMode.Append(), parts)
        .groupBy($"e_id")
        .agg(count(lit(1)).as("n_recent_purchases"), max(unix_micros($"p_ts")).as("last_purchase_us"))
        .orderBy($"e_id")
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "st04 twoSrc p4 (current)" -> (() => st04(singleSource = false, "4")),
      "st04 oneSrc p4" -> (() => st04(singleSource = true, "4")),
      "st04 twoSrc p2" -> (() => st04(singleSource = false, "2")),
      "st04 oneSrc p2" -> (() => st04(singleSource = true, "2")))
    SparkEntry.entry(spark).count()
    (1 to 3).foreach { round =>
      variants.foreach { case (name, q) =>
        val t0 = System.nanoTime()
        val n = q().count()
        println(f"PERF $name round$round ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
