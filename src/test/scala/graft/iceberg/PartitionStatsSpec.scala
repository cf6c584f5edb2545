package graft.iceberg

import graft.SparkSpec

/** `compute_partition_stats` → the metadata `partition-statistics` slot
  * → the `partitions` table served from the FILE (zero manifest opens):
  * content parity with the live sweep, delete-side counts, staleness
  * fallback, replacement, and expiry reclaim. */
class PartitionStatsSpec extends SparkSpec {

  test("partition stats rollup end-to-end") {
    val wh = java.nio.file.Files.createTempDirectory("graft-pstats").toString
    spark.conf.set("spark.sql.catalog.gps",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gps.warehouse", wh)
    spark.sql("CREATE TABLE gps.db.t (k BIGINT, r BIGINT) " +
      "PARTITIONED BY (r) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO gps.db.t SELECT id, id % 3 FROM range(0, 30)")
    val dir = s"$wh/db/t"
    val live = spark.sql(
      "SELECT partition, file_count, record_count FROM gps.db.t.partitions")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val out = spark.sql(
      "CALL gps.system.compute_partition_stats(table => 'db.t')").head()
    assert(out.getLong(1) == 3L, s"partitions_count: $out")
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    assert(meta.partitionStatistics.size == 1 &&
      meta.partitionStatistics.head.snapshotId == out.getLong(0))
    // the table now serves from the FILE — content matches the sweep,
    // and tampering with the file PROVES the serving route (the values
    // change without any table commit — then restored by recompute below)
    val served = spark.sql(
      "SELECT partition, file_count, record_count FROM gps.db.t.partitions")
    assert(served.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet == live)
    val statsPath = meta.partitionStatistics.head.path
    val tampered = spark.read.parquet(statsPath)
      .withColumn("data_record_count",
        org.apache.spark.sql.functions.lit(777L))
    ParquetFiles.writeOne(tampered, statsPath + ".tmp")
    val fs = HadoopConfs.fileSystemFor(statsPath)
    fs.delete(new org.apache.hadoop.fs.Path(statsPath), false)
    fs.rename(new org.apache.hadoop.fs.Path(statsPath + ".tmp"),
      new org.apache.hadoop.fs.Path(statsPath))
    assert(spark.sql("SELECT DISTINCT record_count FROM gps.db.t.partitions")
      .collect().map(_.getLong(0)).toSeq == Seq(777L),
      "partitions must serve from the registered stats file, not the sweep")
    // the file carries the richer spec schema incl. delete-side counts
    val raw = spark.read.parquet(meta.partitionStatistics.head.path)
    assert(raw.columns.toSet == Set("partition", "spec_id",
      "data_record_count", "data_file_count", "total_data_file_size_in_bytes",
      "position_delete_record_count", "position_delete_file_count",
      "equality_delete_record_count", "equality_delete_file_count"))

    // re-analysis at the SAME snapshot REPLACES its entry (the tampered
    // file reclaims, correct values return)
    spark.sql("CALL gps.system.compute_partition_stats(table => 'db.t')")
    val metaR = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    assert(metaR.partitionStatistics.size == 1 &&
      metaR.partitionStatistics.head.path != statsPath, metaR.partitionStatistics.toString)
    assert(!new java.io.File(statsPath).exists(),
      "re-analysis must reclaim the replaced file")
    assert(spark.sql("SELECT sum(record_count) FROM gps.db.t.partitions")
      .head().getLong(0) == 30L)

    // a new commit makes the registration STALE: the table falls back to
    // the live sweep (correct counts, not the file's)
    spark.sql("DELETE FROM gps.db.t WHERE k < 6") // two keys per partition
    val afterDelete = spark.sql(
      "SELECT sum(record_count) FROM gps.db.t.partitions").head().getLong(0)
    assert(afterDelete == 30L, // partitions counts FILES' records; deletes are MOR
      s"stale registration must fall back to the sweep: $afterDelete")
    // recompute at the NEW snapshot: a second per-snapshot entry with
    // the delete-side counts (entries are snapshot-keyed, like the
    // table-statistics slot)
    spark.sql("CALL gps.system.compute_partition_stats(table => 'db.t')")
    val meta2 = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    assert(meta2.partitionStatistics.size == 2,
      meta2.partitionStatistics.toString)
    val newest = meta2.partitionStatistics.maxBy(_.snapshotId)
    val raw2 = spark.read.parquet(newest.path)
    assert(raw2.selectExpr("sum(position_delete_record_count)")
      .head().getLong(0) == 6L)

    // expiry drops entries with their snapshots and reclaims the file
    spark.sql("CALL gps.system.expire_snapshots(table => 'db.t', retain_last => 1)")
    val meta3 = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val gone = meta3.partitionStatistics
      .filterNot(s => meta3.snapshots.exists(_.snapshotId == s.snapshotId))
    assert(gone.isEmpty, s"dangling partition-stats entries: $gone")
  }
}
