package graft.streaming

import graft.SparkSpec

/** Pins the single-batch assumption st05's oracle depends on (see the
  * scaladoc on [[EventStreams.streamDedup]]): AvailableNow over the one
  * events file must deliver all input in exactly one micro-batch, because
  * dropDuplicatesWithinWatermark could re-emit keys across batches
  * separated by more than the watermark delay — which would break the
  * COUNT(DISTINCT) oracle equality. If a future Spark version or source
  * option ever splits the drive, this fails loudly instead of the oracle
  * hash drifting. */
class StreamDedupSpec extends SparkSpec {

  test("st05 drive is a single input micro-batch, keys are globally distinct") {
    val out = EventStreams.streamDedup(spark, sfDir).collect()
    assert(EventStreams.lastDriveInputBatches == 1,
      s"st05 oracle requires a one-batch drive, got ${EventStreams.lastDriveInputBatches}")
    assert(out.nonEmpty)
    // per-type distinct-user counts must each be positive and bounded by
    // the total user population of the slice
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").distinct().count()
    out.foreach { r =>
      val n = r.getLong(1)
      assert(n > 0 && n <= users, s"row $r out of [1, $users]")
    }
  }
}
