package graft.iceberg

import graft.SparkSpec

/** The st16 CDC-upsert guard's scale contract: a key-range-restricted MOR
  * read ([[GraftTable.readKeyRange]]) opens ONLY the files whose committed
  * bound stats can overlap the range. Proven destructively — the
  * non-overlapping data file is physically corrupted, and the pruned read
  * still answers (it never opened the file), while an unpruned full read
  * over the same table fails. This is the difference between a per-batch
  * guard that costs O(overlapping files) and one that rescans every key
  * the table holds.
  */
class KeyRangePruneSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-krp-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val schema = IcebergSchema(0, Seq(
    IcebergField(1, "user_id", required = false, "long"),
    IcebergField(2, "lsn", required = false, "long"),
    IcebergField(3, "value", required = false, "double")))

  private def corrupt(path: String): Unit = {
    val f = new java.io.FileOutputStream(path.stripPrefix("file:"))
    try f.write(Array.fill[Byte](64)(0x5a)) finally f.close()
  }

  test("non-overlapping data files are never opened; deletes apply inside the range") {
    import spark.implicits._
    val dir = freshDir("prune")
    GraftTable.create(dir, schema,
      tableUuid = "c1d2e3f4-0000-4000-8000-00000000krp1",
      timestampMs = 1700000000000L)
    // two upserts with DISJOINT key ranges — two data files, two
    // eq-delete files, each pair bounded to its own range
    GraftTable.upsert(spark,
      dir, (1L to 10L).map(k => (k, 100L, k.toDouble)).toDF("user_id", "lsn", "value"),
      Seq("user_id"))
    GraftTable.upsert(spark,
      dir, (1000L to 1010L).map(k => (k, 100L, k.toDouble)).toDF("user_id", "lsn", "value"),
      Seq("user_id"))
    // third upsert REPLACES part of the high range — its equality deletes
    // must still apply inside the pruned read
    GraftTable.upsert(spark,
      dir, (1000L to 1004L).map(k => (k, 200L, -1.0)).toDF("user_id", "lsn", "value"),
      Seq("user_id"))
    val metaPath = GraftTable.latestMetadataPath(dir)
    val meta = TableMetadata.parseFile(metaPath)
    val dataEntries = meta.currentSnapshot.toSeq
      .flatMap(s => ManifestListReader.read(s.manifestList.get))
      .filter(_.content == 0).flatMap(i => ManifestWriter.read(i.path))
      .filter(e => e.status != 2 && e.content == 0)
    assert(dataEntries.size === 3)
    val lowFile = dataEntries.find(e =>
      SingleValueCodec.decode(IcebergTypes.TLong, e.upperBounds(1)) == 10L)
      .getOrElse(fail("no data file bounded to the low key range")).filePath
    // destroy the low-range file: any read that opens it must now fail
    corrupt(lowFile)
    val pruned = GraftTable.readKeyRange(spark, metaPath, fieldId = 1, 1000L, 1010L)
      .select($"user_id", $"lsn", $"value").collect()
    assert(pruned.length === 11, "pruned read must serve the full high range")
    // the replaced keys carry the THIRD upsert's state (eq deletes applied)
    val replaced = pruned.filter(_.getLong(0) <= 1004L)
    assert(replaced.length === 5)
    assert(replaced.forall(r => r.getLong(1) == 200L && r.getDouble(2) == -1.0),
      "equality deletes must apply inside the pruned read")
    assert(pruned.filter(_.getLong(0) > 1004L).forall(_.getLong(1) == 100L))
    // the corruption is REAL: an unpruned read that must open the low
    // file fails on it
    val full = intercept[Exception] {
      GraftTable.read(spark, metaPath).count()
    }
    assert(full != null)
  }

  test("a range with no overlapping files answers empty without opening anything") {
    import spark.implicits._
    val dir = freshDir("empty")
    GraftTable.create(dir, schema,
      tableUuid = "c1d2e3f4-0000-4000-8000-00000000krp2",
      timestampMs = 1700000000000L)
    GraftTable.upsert(spark,
      dir, (1L to 5L).map(k => (k, 1L, 0.0)).toDF("user_id", "lsn", "value"),
      Seq("user_id"))
    val metaPath = GraftTable.latestMetadataPath(dir)
    val meta = TableMetadata.parseFile(metaPath)
    val entry = meta.currentSnapshot.toSeq
      .flatMap(s => ManifestListReader.read(s.manifestList.get))
      .filter(_.content == 0).flatMap(i => ManifestWriter.read(i.path))
      .filter(e => e.status != 2).head
    corrupt(entry.filePath)
    assert(GraftTable.readKeyRange(spark, metaPath, fieldId = 1, 100L, 200L)
      .count() === 0L)
  }

  test("an unorderable bound (NaN/Infinity) compares as unknown, not a throw") {
    // a float/double bound decoding to NaN has no BigDecimal rendering;
    // the comparison must degrade to None (keep the entry — the
    // conservative pruning direction), never fail the read
    assert(ScanPlanning.cmpValues(Double.NaN, 5.0).isEmpty)
    assert(ScanPlanning.cmpValues(5.0f, Float.NaN).isEmpty)
    assert(ScanPlanning.cmpValues(Double.PositiveInfinity, 5.0).isEmpty)
    assert(ScanPlanning.cmpValues(Double.NegativeInfinity, 1.0).isEmpty)
    assert(ScanPlanning.cmpValues(2.5, 5.0).contains(-1))
    assert(ScanPlanning.cmpValues(5L, 5.0).contains(0))
  }
}
