package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.iceberg._

/** rewrite_manifests + remove_orphan_files — the two maintenance
  * operations a platform team schedules:
  *
  *   - manifest consolidation is METADATA-ONLY (data files never open),
  *     preserves every entry's materialized sequence (pending deletes
  *     still apply afterwards — the field 515/516 contract), and is
  *     destructively proven: the pre-rewrite manifests are corrupted on
  *     disk and the current read still answers;
  *   - the orphan sweep reclaims only files unreachable from EVERY
  *     snapshot (time-travel-live files survive) and honors the
  *     older-than guard.
  */
class ManifestMaintSpec extends SparkSpec {

  private def mkTable(dir: String): Unit =
    GraftTable.create(dir, IcebergSchema(0, Seq(
      IcebergField(1, "n_nationkey", required = false, "int"),
      IcebergField(2, "n_name", required = false, "string"),
      IcebergField(3, "n_regionkey", required = false, "int"))),
      tableUuid = java.util.UUID.randomUUID().toString, timestampMs = 1700000000000L)

  private def nationRow(k: Int) =
    graft.Tables.load(spark, sfDir, "nation").filter(col("n_nationkey") === k)

  private def listInfos(dir: String): Seq[ManifestListReader.ManifestFileInfo] =
    ManifestListReader.read(TableMetadata
      .parseFile(GraftTable.latestMetadataPath(dir))
      .currentSnapshot.get.manifestList.get)

  test("rewrite_manifests consolidates N manifests to 1; deletes still apply; destructive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rwm").toString
    mkTable(dir)
    GraftTable.append(spark, dir, nationRow(3))
    GraftTable.append(spark, dir, nationRow(5))
    GraftTable.append(spark, dir, nationRow(7))
    // a pending MOR delete: key 5 must STAY deleted after the rewrite —
    // only exact sequence preservation keeps the delete applicable
    GraftTable.deleteWhere(spark, dir, col("n_nationkey") === 5)
    val before = listInfos(dir)
    assert(before.count(_.content == 0) == 3)
    val beforeDel = before.filter(_.content == 1)
    assert(beforeDel.nonEmpty)

    val result = GraftTable.rewriteManifests(spark, dir)
    val after = listInfos(dir)
    val dataAfter = after.filter(_.content == 0)
    assert(dataAfter.size == 1, s"expected 1 consolidated manifest, got $after")
    // entries are EXISTING with explicit sequences; field 516 is the
    // true minimum (an inherited default would break delete pruning)
    val entries = ManifestWriter.read(dataAfter.head.path)
    assert(entries.size == 3 && entries.forall(_.status == 0))
    assert(entries.forall(_.sequenceNumber.isDefined))
    assert(dataAfter.head.minSequenceNumber == entries.flatMap(_.sequenceNumber).min)
    // delete manifests carried with original provenance
    val delAfter = after.filter(_.content == 1)
    assert(delAfter.map(_.path).toSet == beforeDel.map(_.path).toSet)
    assert(delAfter.map(i => i.path -> i.sequenceNumber).toMap ==
      beforeDel.map(i => i.path -> i.sequenceNumber).toMap)

    // destructive: the PRE-rewrite manifests are garbage now — the
    // current-snapshot read must not open them
    before.filter(_.content == 0).foreach(i =>
      java.nio.file.Files.write(java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(i.path).toUri.getPath),
        "corrupted: consolidated reads must not open old manifests".getBytes))
    val live = GraftTable.read(spark, GraftTable.latestMetadataPath(dir))
      .orderBy(col("n_nationkey")).collect()
    assert(live.map(_.getInt(0)).toSeq == Seq(3, 7), "delete must survive rewrite")
    assert(result.metadata.currentSnapshot.get.operation.contains("replace"))
  }

  test("rewrite_manifests consolidates PER TUPLE on a partitioned table: " +
      "exact field-507 summaries survive (one-per-spec would widen them " +
      "to the whole domain and kill list pruning)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rws").toString
    GraftTable.create(dir, IcebergSchema(0, Seq(
      IcebergField(1, "n_nationkey", required = false, "int"),
      IcebergField(3, "n_regionkey", required = false, "int"))),
      tableUuid = java.util.UUID.randomUUID().toString, timestampMs = 1700000000000L,
      spec = PartitionSpec(0,
        Seq(PartitionField("n_regionkey_id", "identity", 3, 1000))))
    val nation = graft.Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
    // two appends × 5 regions = 10 tuple-pure manifests
    GraftTable.append(spark, dir, nation)
    GraftTable.append(spark, dir, nation)
    assert(listInfos(dir).count(_.content == 0) == 10)
    GraftTable.rewriteManifests(spark, dir)
    val dataAfter = listInfos(dir).filter(_.content == 0)
    assert(dataAfter.size == 5, s"one manifest per tuple, got $dataAfter")
    // each consolidated manifest keeps its EXACT single-region summary
    val regions = dataAfter.map { i =>
      val s = i.summaries.get.head
      val lo = SingleValueCodec.decode(IcebergTypes.TInt, s.lower.get)
      val hi = SingleValueCodec.decode(IcebergTypes.TInt, s.upper.get)
      assert(lo == hi, s"tuple summary must stay exact: [$lo,$hi]")
      lo
    }
    assert(regions.toSet == Set(0, 1, 2, 3, 4))
    // each holds BOTH appends' entries for its region
    assert(dataAfter.forall(i => ManifestWriter.read(i.path).size == 2))
    // list-level pruning alive across the consolidation: destroy every
    // OTHER region's manifest — a scan of the surviving region must not
    // open them (the first listed manifest survives: the source infers
    // its Avro schema from it)
    val keep = dataAfter.head
    val keepRegion = SingleValueCodec.decode(IcebergTypes.TInt,
      keep.summaries.get.head.lower.get).asInstanceOf[Int]
    dataAfter.tail.foreach(i =>
      java.nio.file.Files.write(java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(i.path).toUri.getPath),
        "corrupted: pruned manifests must never open".getBytes))
    val survivors = spark.read.format("graft-manifest")
      .option("metadata", GraftTable.latestMetadataPath(dir))
      .option("manifest-list", TableMetadata
        .parseFile(GraftTable.latestMetadataPath(dir))
        .currentSnapshot.get.manifestList.get)
      .load()
      .filter(col("lower_n_regionkey") <= keepRegion &&
        col("upper_n_regionkey") >= keepRegion)
      .select(col("data_file.file_path"))
    assert(survivors.collect().length == 2,
      "exactly the surviving region's two entries plan past the corrupted manifests")
  }

  test("rewrite_manifests drops groups with no live entries: a tombstone-" +
      "only manifest is never re-listed as an empty one forever") {
    val wh = java.nio.file.Files.createTempDirectory("graft-rwd0").toString
    spark.conf.set("spark.sql.catalog.grwd0", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grwd0.warehouse", wh)
    spark.sql("CREATE TABLE grwd0.db.t (k BIGINT, r BIGINT) PARTITIONED BY (r)")
    spark.sql("INSERT INTO grwd0.db.t SELECT id, id % 3 FROM RANGE(30)")
    val dir = s"$wh/db/t"
    // full compaction leaves per-tuple output manifests PLUS a plain
    // manifest holding only the replaced files' tombstones
    spark.sql("CALL grwd0.system.rewrite_data_files(table => 'db.t')")
    val preData = listInfos(dir).filter(_.content == 0)
    assert(preData.exists(i =>
      ManifestWriter.read(i.path).forall(_.status == 2)),
      s"the compaction must leave a tombstone-only manifest: $preData")
    spark.sql("CALL grwd0.system.rewrite_manifests(table => 'db.t')")
    def liveDataManifests() = listInfos(dir).filter(_.content == 0)
    val after = liveDataManifests()
    assert(after.size == 3, s"one manifest per live tuple, got $after")
    assert(after.forall(i => ManifestWriter.read(i.path)
        .exists(_.status != 2)),
      "no re-listed manifest may be empty or tombstone-only")
    // idempotent: a second pass neither grows nor shrinks the set
    spark.sql("CALL grwd0.system.rewrite_manifests(table => 'db.t')")
    assert(liveDataManifests().size == 3)
    assert(spark.sql("SELECT COUNT(*), CAST(SUM(k) AS BIGINT) FROM grwd0.db.t")
      .head.toSeq == Seq(30L, 435L))
  }

  test("upsert falls back to the untupled shape on a spec the write " +
      "kernel cannot split (void transform)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upv").toString
    GraftTable.create(dir, IcebergSchema(0, Seq(
      IcebergField(1, "k", required = false, "long"),
      IcebergField(2, "v", required = false, "string"))),
      tableUuid = java.util.UUID.randomUUID().toString,
      timestampMs = 1700000000000L,
      spec = PartitionSpec(0, Seq(PartitionField("k_void", "void", 1, 1000))))
    // the pre-r19 contract: an upsert on a spec the per-tuple writer
    // cannot split must still COMMIT (untupled data file), not throw
    GraftTable.upsert(spark, dir,
      spark.sql("SELECT CAST(1 AS BIGINT) k, 'a' v " +
        "UNION ALL SELECT CAST(2 AS BIGINT), 'b'"), Seq("k"))
    GraftTable.upsert(spark, dir,
      spark.sql("SELECT CAST(2 AS BIGINT) k, 'B' v"), Seq("k"))
    val rows = GraftTable.read(spark, GraftTable.latestMetadataPath(dir))
      .orderBy(col("k")).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B")))
  }

  test("remove_orphan_files deletes only unreachable files; older-than guard holds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orph").toString
    mkTable(dir)
    GraftTable.append(spark, dir, nationRow(3))
    // a file live ONLY in snapshot 1 (overwritten at head) must survive:
    // time travel still resolves it
    spark.sql("SELECT 1")
    GraftTable.append(spark, dir, nationRow(5))
    val fs = HadoopConfs.fileSystemFor(dir)
    val debris = new org.apache.hadoop.fs.Path(s"$dir/data/zz-debris.parquet")
    val out = fs.create(debris)
    out.write("not a committed file".getBytes); out.close()
    // age guard: debris was written "now"; an olderThan in the past
    // must protect it (an in-flight writer's file)
    assert(GraftTable.removeOrphanFiles(spark, dir, Some(1L)) == 0L)
    assert(fs.exists(debris))
    // the candidate set names exactly the debris (dry-run inspection path)
    val cands = GraftTable.orphanFileCandidates(spark, dir)
      .select("path").collect().map(r =>
        new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSeq
    assert(cands == Seq("zz-debris.parquet"))
    val deleted = GraftTable.removeOrphanFiles(spark, dir)
    assert(deleted == 1L)
    assert(!fs.exists(debris))
    // every committed file survived — both snapshots still read
    assert(GraftTable.read(spark, GraftTable.latestMetadataPath(dir)).count() == 2L)
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val snap1 = meta.snapshots.minBy(_.snapshotId).snapshotId
    assert(GraftTable.read(spark, GraftTable.latestMetadataPath(dir),
      snapshotId = Some(snap1)).count() == 1L)
  }
}
