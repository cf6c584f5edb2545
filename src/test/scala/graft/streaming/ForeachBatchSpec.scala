package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The foreachBatch sink pattern — the micro-batch escape hatch for sinks
  * Structured Streaming lacks natively (JDBC upserts, multi-table writes):
  * each batch arrives as a plain DataFrame with a batch id for idempotent
  * exactly-once writes. Here: stream events to partitioned parquet,
  * assert content parity with the batch read and batch-id availability. */
class ForeachBatchSpec extends SparkSpec {

  test("foreachBatch writes each micro-batch to parquet with a batch id") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-feb").toString
    val seenBatches = scala.collection.mutable.ArrayBuffer.empty[Long]

    val stream = spark.readStream
      .schema(graft.Tables.load(spark, sfDir, "events").schema)
      .parquet(s"$sfDir/*events.parquet")
      .select($"event_id", $"user_id", $"event_type")

    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        seenBatches.synchronized { seenBatches += batchId }
        // idempotence hook: a real sink keys the write on batchId;
        // overwrite-by-batch directory is the parquet analog
        batch.write.mode("overwrite").parquet(s"$out/batch=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    assert(seenBatches.nonEmpty)
    assert(seenBatches.toSet.size == seenBatches.size, "batch ids must be unique")
    val written = spark.read.parquet(s"$out/batch=*")
    val expect = graft.Tables.load(spark, sfDir, "events").count()
    assert(written.count() == expect)
    assert(written.select(countDistinct($"event_id")).head.getLong(0) == expect)
  }
}
