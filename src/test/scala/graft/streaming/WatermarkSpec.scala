package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

/** Demonstrates real watermark semantics: an event arriving after the
  * watermark has finalized its window is dropped in append mode.
  *
  * Empirical Spark detail this spec pins down: a late row is only dropped
  * once the watermark that passed its window was established in an
  * *earlier* batch — a row arriving in the same micro-batch in which the
  * watermark first crosses its window still merges into the open state
  * before eviction. Hence three batches: (1) events that advance the
  * watermark, (2) a batch that lets the watermark settle and evict,
  * (3) the late arrival, which must be discarded.
  */
class WatermarkSpec extends SparkSpec {

  test("append mode drops events later than a settled watermark") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream").toString

    def write(batch: String, rows: (String, String)*): Unit = {
      rows.toSeq.toDF("ts_str", "k")
        .select(to_timestamp($"ts_str").as("ts"), $"k")
        .coalesce(1).write.parquet(s"$dir/in/$batch")
      // distinct mtimes: the file source orders micro-batches by them
      Thread.sleep(1200)
    }
    write("b1", ("2024-01-01 10:00:00", "a"), ("2024-01-01 10:05:00", "a"),
      ("2024-01-01 12:00:00", "b")) // advances watermark to 11:50
    write("b2", ("2024-01-01 12:01:00", "b")) // watermark settles; 10:00 window evicts
    write("b3", ("2024-01-01 10:20:00", "late")) // behind the settled watermark

    val stream = spark.readStream
      .schema("ts timestamp, k string")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in/*")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"), collect_set($"k").as("ks"))

    val q = stream.writeStream
      .format("memory").queryName("wm_test")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // Spark's own accounting: exactly one row discarded by the watermark
    val dropped = q.recentProgress
      .flatMap(_.stateOperators.headOption.map(_.numRowsDroppedByWatermark)).sum
    assert(dropped == 1, s"expected 1 dropped row, got $dropped")

    val rows = spark.table("wm_test")
      .select(date_format($"window.start", "HH:mm").as("start"), $"n", $"ks")
      .collect()
    val byStart = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getAs[scala.collection.Seq[String]](2).toSet)).toMap
    assert(byStart.contains("10:00"), s"10:00 window not emitted: ${byStart.keys}")
    assert(byStart("10:00") == ((2L, Set("a"))), "late event must not appear")
    // the 12:00 window is still open at termination → not emitted in append
    assert(!byStart.contains("12:00"))
  }

  test("st15: append finalization emits exactly the closed windows") {
    import spark.implicits._
    val got = EventStreams.queries("st15_hourly_append")(spark, sfDir)
    // batch recomputation of the same cutoff: a window is closed once the
    // watermark (max ts − 30 min) passes its END
    val events = graft.Tables.load(spark, sfDir, "events")
    val cutoff = events.agg(max($"ts")).head.getTimestamp(0).toInstant
      .minusSeconds(30 * 60)
    val expected = events
      .withColumn("hour", date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:00:00"))
      .filter(date_trunc("hour", $"ts") + expr("INTERVAL 1 HOUR") <= lit(
        java.sql.Timestamp.from(cutoff)))
      .groupBy($"hour", $"event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value".cast("decimal(12,2)")), 2).cast("double").as("total_value"))
      .orderBy($"hour", $"event_type")
    val open = events.select(countDistinct(date_trunc("hour", $"ts"))).head.getLong(0) -
      expected.select(countDistinct($"hour")).head.getLong(0)
    assert(open >= 1, "fixture must leave at least one window open at the cutoff")
    assert(got.collect().toSeq == expected.collect().toSeq,
      "append output must equal the batch recomputation of closed windows")
  }
}
