package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}
import graft.iceberg._
import graft.sources.GraftSnapshotOffset

/** The `graft-table` streaming SOURCE: incremental snapshot consumption
  * over the micro-batch API — offsets are snapshot ids, each batch serves
  * exactly the files its snapshots ADDED, planning opens only the new
  * snapshots' manifests (delta-proportional, proven destructively), and
  * checkpointed restarts resume where the last run ended. */
class TableStreamReadSpec extends SparkSpec {

  private val T0 = 1700000000000L

  private def createNation(dir: String, tail: String): Unit =
    GraftTable.create(dir, IcebergSchema(0, Seq(
      IcebergField(1, "n_nationkey", required = false, "int"),
      IcebergField(2, "n_name", required = false, "string"),
      IcebergField(3, "n_regionkey", required = false, "int"))),
      tableUuid = s"b6b9a6a1-0000-4000-8000-0000000000$tail", timestampMs = T0)

  private def drainToParquet(dir: String, out: String, extra: Map[String, String] = Map.empty): Unit = {
    val q = extra.foldLeft(spark.readStream.format("graft-table")
        .option("metadata", GraftTable.latestMetadataPath(dir))) {
        case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("incremental consumption with checkpointed restart; delta-proportional planning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-streamread").toString
    val out = java.nio.file.Files.createTempDirectory("graft-streamout").toString
    val nation = Tables.load(spark, sfDir, "nation")
    createNation(dir, "e1")
    GraftTable.append(spark, dir, nation.filter(col("n_nationkey") < 13)
      .orderBy(col("n_nationkey")))
    GraftTable.append(spark, dir, nation
      .filter(col("n_nationkey") >= 13 && col("n_nationkey") < 20)
      .orderBy(col("n_nationkey")))
    drainToParquet(dir, out)
    assert(spark.read.parquet(s"$out/data").count() == 20L)
    // restart after a THIRD append: only the new snapshot's rows arrive
    GraftTable.append(spark, dir, nation.filter(col("n_nationkey") >= 20)
      .orderBy(col("n_nationkey")))
    // destructive delta-proportionality proof: corrupt snapshot 1's
    // manifest — the restarted stream plans ONLY snapshot 3's manifest,
    // so it succeeds despite the wreckage behind the checkpoint
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val m1 = ManifestListReader.read(meta.currentSnapshot.get.manifestList.get)
      .find(_.addedSnapshotId == 1L).get
    java.nio.file.Files.write(java.nio.file.Paths.get(m1.path),
      "corrupted: streaming restart must not re-open consumed snapshots".getBytes)
    drainToParquet(dir, out)
    val all = spark.read.parquet(s"$out/data")
    assert(all.count() == 25L)
    assert(all.select(countDistinct(col("n_nationkey"))).head().getLong(0) == 25L)
  }

  test("max-snapshots-per-trigger bounds each micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-streamlim").toString
    val out = java.nio.file.Files.createTempDirectory("graft-streamlimout").toString
    val nation = Tables.load(spark, sfDir, "nation")
    createNation(dir, "e2")
    Seq(0 until 9, 9 until 18, 18 until 25).foreach { r =>
      GraftTable.append(spark, dir, nation
        .filter(col("n_nationkey") >= r.head && col("n_nationkey") <= r.last)
        .orderBy(col("n_nationkey")))
    }
    val q = spark.readStream.format("graft-table")
      .option("metadata", GraftTable.latestMetadataPath(dir))
      .option("max-snapshots-per-trigger", "1")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$out/data").count() == 25L)
    // three snapshots, one per batch: at least 3 progress entries with rows
    assert(q.recentProgress.count(_.numInputRows > 0) == 3,
      q.recentProgress.map(_.numInputRows).mkString(","))
  }

  test("delete snapshots stream as empty; overwrites fail unless skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-streamskip").toString
    val nation = Tables.load(spark, sfDir, "nation")
    createNation(dir, "e3")
    GraftTable.append(spark, dir, nation.orderBy(col("n_nationkey")))
    GraftTable.deleteWhere(spark, dir, col("n_regionkey") === 2)
    // deletes never retract emitted rows: the stream serves all 25
    val out1 = java.nio.file.Files.createTempDirectory("graft-streamskipo1").toString
    drainToParquet(dir, out1)
    assert(spark.read.parquet(s"$out1/data").count() == 25L)
    // compaction rewrites files: streaming over it must refuse...
    GraftTable.compact(spark, dir, targetBytes = 1L << 30)
    val out2 = java.nio.file.Files.createTempDirectory("graft-streamskipo2").toString
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainToParquet(dir, out2)
    }
    assert(thrown.getMessage.contains("non-append") ||
      Option(thrown.getCause).exists(_.getMessage.contains("non-append")))
    // ...and skip them when told to (appended rows arrive once, rewritten
    // files are never re-emitted)
    val out3 = java.nio.file.Files.createTempDirectory("graft-streamskipo3").toString
    drainToParquet(dir, out3, Map("streaming-skip-overwrite-snapshots" -> "true"))
    assert(spark.read.parquet(s"$out3/data").count() == 25L)
  }

  test("starting-snapshot-id streams only commits after the named snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-streamfrom").toString
    val out = java.nio.file.Files.createTempDirectory("graft-streamfromout").toString
    val nation = Tables.load(spark, sfDir, "nation")
    createNation(dir, "e4")
    GraftTable.append(spark, dir, nation.filter(col("n_nationkey") < 13)
      .orderBy(col("n_nationkey")))
    GraftTable.append(spark, dir, nation.filter(col("n_nationkey") >= 13)
      .orderBy(col("n_nationkey")))
    drainToParquet(dir, out, Map("starting-snapshot-id" -> "1"))
    val got = spark.read.parquet(s"$out/data")
    assert(got.count() == 12L) // keys 13..24 only
    assert(got.agg(min(col("n_nationkey"))).head().getInt(0) == 13)
  }

  test("a checkpoint that predates snapshot expiry fails instead of losing rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-streamexp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-streamexpout").toString
    val nation = Tables.load(spark, sfDir, "nation")
    createNation(dir, "e5")
    Seq(0 until 9, 9 until 18, 18 until 25).foreach { r =>
      GraftTable.append(spark, dir, nation
        .filter(col("n_nationkey") >= r.head && col("n_nationkey") <= r.last)
        .orderBy(col("n_nationkey")))
    }
    // consume EXACTLY the first snapshot, then stop
    val q1 = spark.readStream.format("graft-table")
      .option("metadata", GraftTable.latestMetadataPath(dir))
      .option("max-snapshots-per-trigger", "1")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/_checkpoint")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    q1.awaitTermination()
    assert(spark.read.parquet(s"$out/data").count() == 9L)
    // expire everything but the head: snapshot 2 is gone for good
    GraftTable.expireSnapshots(spark, dir, keepLast = 1)
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainToParquet(dir, out)
    }
    assert(thrown.getMessage.contains("expired") ||
      Option(thrown.getCause).exists(_.getMessage.contains("expired")),
      thrown.getMessage)
  }

  test("starting-timestamp-ms resolves to the exclusive snapshot start") {
    val dir = java.nio.file.Files.createTempDirectory("graft-streamts").toString
    val out = java.nio.file.Files.createTempDirectory("graft-streamtsout").toString
    val nation = Tables.load(spark, sfDir, "nation")
    createNation(dir, "e6")
    GraftTable.append(spark, dir, nation.filter(col("n_nationkey") < 13)
      .orderBy(col("n_nationkey")))  // snapshot 1 at T0+1000
    GraftTable.append(spark, dir, nation.filter(col("n_nationkey") >= 13)
      .orderBy(col("n_nationkey")))  // snapshot 2 at T0+2000
    // an instant between the two commits: only snapshot 2 streams
    drainToParquet(dir, out, Map("starting-timestamp-ms" -> (T0 + 1500).toString))
    assert(spark.read.parquet(s"$out/data").count() == 12L)
    // an instant before the first commit streams everything
    val out2 = java.nio.file.Files.createTempDirectory("graft-streamtsout2").toString
    drainToParquet(dir, out2, Map("starting-timestamp-ms" -> (T0 - 1).toString))
    assert(spark.read.parquet(s"$out2/data").count() == 25L)
  }

  test("ReadLimit maxRows bounds batches by snapshot row counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-streamrows").toString
    val nation = Tables.load(spark, sfDir, "nation")
    createNation(dir, "e7")
    Seq(0 until 9, 9 until 18, 18 until 25).foreach { r =>
      GraftTable.append(spark, dir, nation
        .filter(col("n_nationkey") >= r.head && col("n_nationkey") <= r.last)
        .orderBy(col("n_nationkey")))
    }
    // snapshots carry 9/9/7 rows; the admission maths drive the offsets
    val stream = new graft.sources.GraftTableMicroBatchStream(
      GraftTable.latestMetadataPath(dir),
      org.apache.spark.sql.types.StructType(Nil),
      graft.sources.StreamReadOptions(),
      new SerializableHadoopConf(HadoopConfs.active()))
    val l1 = stream.latestOffset(graft.sources.GraftSnapshotOffset(0L),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(10L))
    assert(l1 == graft.sources.GraftSnapshotOffset(1L), l1)
    val l2 = stream.latestOffset(graft.sources.GraftSnapshotOffset(1L),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(100L))
    assert(l2 == graft.sources.GraftSnapshotOffset(3L), l2)
    // a budget below the next snapshot's rows still admits ONE (progress)
    val l3 = stream.latestOffset(graft.sources.GraftSnapshotOffset(0L),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(1L))
    assert(l3 == graft.sources.GraftSnapshotOffset(1L), l3)
  }

  test("offset json round-trips") {
    val o = GraftSnapshotOffset(42L)
    assert(GraftSnapshotOffset.parse(o.json()) == o)
  }
}
