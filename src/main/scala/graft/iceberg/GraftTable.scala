package graft.iceberg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.operators.Lakehouse

/** The one-call table read — the public API a user points at a committed
  * `metadata.json` to get the TABLE as a DataFrame, with every layer this
  * library implements composed in its spec order:
  *
  *   1. snapshot resolution: current head, explicit snapshot id, or a
  *      named ref (tag/branch) — time travel is just resolution;
  *   2. two-level planning: manifest-list → manifests, content-routed
  *      (data vs delete manifests, list field 517);
  *   3. schema-evolution projection: every data file reads through the
  *      document's CURRENT schema, pre-evolution files null-fill;
  *   4. sequence-scoped merge-on-read: position deletes apply to data
  *      files with sequence <= theirs, equality deletes to strictly
  *      lower — commit order decides applicability, not reachability.
  *
  * Planning state is KB-scale (the same driver boundary Iceberg's own
  * planner keeps); every data read is a distributed parquet scan, one
  * scan per data sequence number (the per-commit group whose `_seq`
  * constant the MOR join needs — bounded by the snapshot count, and in
  * practice by compaction). Delete sides stay optimizer-chosen joins:
  * AQE broadcasts metadata-scale delete sets, mass deletes degrade to
  * shuffle anti-joins instead of forced-broadcast OOMs.
  */
object GraftTable {

  /** Spark read schema derived from the document's current schema — the
    * null-fill projection a v2 reader applies to pre-evolution files. */
  def sparkSchema(meta: TableMetadata): StructType =
    StructType(meta.currentSchema.fields.map(f =>
      StructField(f.name, IcebergTypes.fromStringOpt(f.fieldType).getOrElse(
        throw new IllegalArgumentException(s"unsupported type ${f.fieldType}")).sparkType,
        nullable = true)))

  private def resolveSnapshot(meta: TableMetadata,
      snapshotId: Option[Long], ref: Option[String]): Snapshot = {
    require(snapshotId.isEmpty || ref.isEmpty, "pass snapshotId OR ref, not both")
    val id = snapshotId.orElse(ref.map { r =>
      meta.refs.find(_.name == r).getOrElse(
        throw new IllegalArgumentException(s"unknown ref '$r'")).snapshotId
    }).orElse(meta.currentSnapshotId).getOrElse(
      throw new IllegalArgumentException("table has no current snapshot"))
    meta.snapshot(id).getOrElse(
      throw new IllegalArgumentException(s"unknown snapshot $id"))
  }

  /** Read a committed table. `metadataPath` is the document to trust —
    * callers wanting "latest" resolve it first (OptimisticCommit
    * .currentVersion); `snapshotId`/`ref` select a non-head snapshot. */
  def read(spark: SparkSession, metadataPath: String,
      snapshotId: Option[Long] = None, ref: Option[String] = None): DataFrame = {
    val meta = TableMetadata.parseFile(metadataPath)
    val snap = resolveSnapshot(meta, snapshotId, ref)
    val listPath = snap.manifestList.getOrElse(
      throw new IllegalArgumentException(s"snapshot ${snap.snapshotId} has no manifest-list"))
    val infos = ManifestListReader.read(listPath)
    // (path, content, seq) per live file, routed by list- then entry-level
    // content; DELETED entries (status 2) drop out of the live set
    def entriesOf(listContent: Int): Seq[ManifestWriter.EntryData] =
      infos.filter(_.content == listContent).flatMap(i => ManifestWriter.read(i.path))
        .filter(_.status != 2)
    val schema = sparkSchema(meta)
    val dataEntries = entriesOf(0)
    if (dataEntries.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // one distributed scan per data sequence number: the group shares its
    // `_seq` constant (how a scan task carries it at cluster scale)
    def bySeq(entries: Seq[ManifestWriter.EntryData]): Seq[(Long, Seq[String])] =
      entries.groupBy(_.sequenceNumber.getOrElse(0L)).toSeq.sortBy(_._1)
        .map { case (s, es) => (s, es.map(_.filePath)) }
    val data = bySeq(dataEntries).map { case (seq, files) =>
      spark.read.schema(schema).parquet(files: _*)
        .select(col("*"),
          col("_metadata.file_path").as("_file"),
          col("_metadata.row_index").as("_pos"),
          lit(seq).as("_seq"))
    }.reduce(_ unionByName _)
    val deleteEntries = entriesOf(1)
    val posApplied = bySeq(deleteEntries.filter(_.content == 1)) match {
      case Nil => data
      case groups =>
        val deletes = groups.map { case (seq, files) =>
          spark.read.parquet(files: _*)
            .select(col("file_path"), col("pos"), lit(seq).as("_del_seq"))
        }.reduce(_ unionByName _)
        Lakehouse.applyPositionDeletesScoped(data, deletes)
    }
    // equality deletes may differ in schema file-to-file (each file's
    // schema IS its equality-column set) — apply per sequence group
    val eqApplied = bySeq(deleteEntries.filter(_.content == 2))
      .foldLeft(posApplied) { case (acc, (seq, files)) =>
        Lakehouse.applyEqualityDeletesScoped(acc,
          spark.read.parquet(files: _*).withColumn("_del_seq", lit(seq)))
      }
    eqApplied.select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  // ------------------------------------------------------------ writes
  // The write half of the one-call API: create / append / deleteWhere,
  // every commit through the OptimisticCommit CAS loop so concurrent
  // writers serialize onto one linear history. Data sequence number =
  // the snapshot id of a linear history — derived INSIDE the update from
  // the refreshed base, so a retried commit re-sequences correctly.

  /** Latest committed metadata path (refresh). */
  def latestMetadataPath(tableDir: String): String =
    OptimisticCommit.metadataPath(tableDir, OptimisticCommit.currentVersion(tableDir))

  /** Create an empty v2 table: writes v1.metadata.json. */
  def create(tableDir: String, schema: IcebergSchema, tableUuid: String,
      timestampMs: Long): String = {
    require(OptimisticCommit.currentVersion(tableDir) == 0,
      s"table already exists under $tableDir")
    val path = OptimisticCommit.metadataPath(tableDir, 1)
    MetadataWriter.write(path, TableMetadata(
      formatVersion = 2, tableUuid = tableUuid, location = tableDir,
      lastUpdatedMs = timestampMs, topLevelSchema = None,
      currentSchemaId = Some(schema.schemaId), schemas = Seq(schema),
      partitionSpecs = Seq(PartitionSpec(0, Nil)), defaultSpecId = 0,
      sortOrders = Seq(SortOrder(0, Nil)), defaultSortOrderId = 0,
      properties = Map.empty, currentSnapshotId = None, refs = Nil,
      snapshots = Nil, snapshotLog = Nil, metadataLog = Nil))
    path
  }

  /** Min/max bound stats for every primitive schema field, derived from
    * the written file in ONE distributed aggregate — never fabricated. */
  private def deriveStats(spark: SparkSession, file: String, meta: TableMetadata)
      : (Long, Map[Int, Array[Byte]], Map[Int, Array[Byte]]) = {
    val typed = meta.currentSchema.fields.flatMap(f =>
      IcebergTypes.fromStringOpt(f.fieldType).map(t => (f, t)))
    val aggs = count(lit(1)) +: typed.flatMap { case (f, _) =>
      Seq(min(col(f.name)), max(col(f.name))) }
    val row = spark.read.parquet(file).agg(aggs.head, aggs.tail: _*).head()
    def enc(t: IcebergType, v: Any): Option[Array[Byte]] = v match {
      case null => None
      case d: java.sql.Date => Some(SingleValueCodec.encode(t, d.toLocalDate))
      case ts: java.sql.Timestamp => Some(SingleValueCodec.encode(t, ts.toLocalDateTime))
      case other => Some(SingleValueCodec.encode(t, other))
    }
    val bounds = typed.zipWithIndex.flatMap { case ((f, t), i) =>
      for (lo <- enc(t, row.get(1 + 2 * i)); hi <- enc(t, row.get(2 + 2 * i)))
        yield (f.id, lo, hi)
    }
    (row.getLong(0),
      bounds.map(b => b._1 -> b._2).toMap,
      bounds.map(b => b._1 -> b._3).toMap)
  }

  /** Previous manifests with their original provenance, read from the
    * refreshed base's list — what a commit carries forward. */
  private def carryForward(base: TableMetadata)
      : Seq[ManifestListReader.ManifestFileInfo] =
    base.currentSnapshot.toSeq.flatMap(s => ManifestListReader.read(s.manifestList.get))

  private def writeList(path: String, carried: Seq[ManifestListReader.ManifestFileInfo],
      newManifest: String, newCount: Int, newContent: Int, snapId: Long): Unit =
    ManifestListWriter.write(path, carried.map(_.path) :+ newManifest, snapId,
      addedDataFilesCount = newCount,
      contents = (carried.map(i => i.path -> i.content) :+ (newManifest -> newContent)).toMap,
      specIds = carried.map(i => i.path -> i.specId).toMap,
      addedSnapshotIds = carried.map(i => i.path -> i.addedSnapshotId).toMap,
      addedCounts = carried.map(i => i.path -> i.addedDataFilesCount).toMap)

  /** Append `df` as one data file + one CAS-committed append snapshot.
    * The file lands once (before the loop); sequencing, provenance, and
    * the snapshot chain re-derive from the refreshed base on retry. */
  def append(spark: SparkSession, tableDir: String, df: DataFrame): OptimisticCommit.CommitResult = {
    val meta0 = TableMetadata.parseFile(latestMetadataPath(tableDir))
    val schema = sparkSchema(meta0)
    val file = s"$tableDir/data/append-${java.util.UUID.randomUUID()}.parquet"
    ParquetFiles.writeOne(
      df.select(schema.fieldNames.map(col).toIndexedSeq: _*), file)
    val (n, lower, upper) = deriveStats(spark, file, meta0)
    OptimisticCommit.commit(tableDir, (base, basePath) => {
      val snapId = (base.snapshots.map(_.snapshotId) :+ 0L).max + 1
      // manifest/list names carry a per-attempt uuid (Iceberg's own
      // snap-<id>-<attempt>-<uuid> convention): two racing committers may
      // both prepare "snapshot 2", and fixed names would let the loser
      // clobber the winner's just-committed files before its retry
      val attempt = java.util.UUID.randomUUID()
      val manifest = s"$tableDir/m-append-$snapId-$attempt.avro"
      ManifestWriter.write(manifest, Seq(ManifestWriter.EntryData(
        1, snapId, file, n, ParquetFiles.length(file), lower, upper,
        content = 0, sequenceNumber = Some(snapId))))
      val list = s"$tableDir/snap-$snapId-$attempt-list.avro"
      writeList(list, carryForward(base), manifest, 1, 0, snapId)
      MetadataWriter.commitSnapshot(base,
        Snapshot(snapId, base.currentSnapshotId, base.lastUpdatedMs + 1000,
          Some("append"), Map("added-data-files" -> "1", "added-records" -> n.toString),
          Some(list), base.currentSchemaId),
        Some(basePath))
    })
  }

  /** Row-level DELETE: capture (file_path, pos) of matching rows across
    * the current data files, land them as ONE position-delete file, and
    * CAS-commit a delete snapshot. The predicate is an ordinary Column
    * over the table's schema — evaluated in one distributed scan. */
  def deleteWhere(spark: SparkSession, tableDir: String,
      predicate: org.apache.spark.sql.Column): OptimisticCommit.CommitResult = {
    val meta0 = TableMetadata.parseFile(latestMetadataPath(tableDir))
    val snap = resolveSnapshot(meta0, None, None)
    val dataFiles = ManifestListReader.read(snap.manifestList.get)
      .filter(_.content == 0).flatMap(i => ManifestWriter.read(i.path))
      .filter(e => e.status != 2 && e.content == 0).map(_.filePath)
    require(dataFiles.nonEmpty, "deleteWhere on a table with no data files")
    val delFile = s"$tableDir/data/delete-${java.util.UUID.randomUUID()}.parquet"
    // Iceberg requires position deletes sorted by (file_path, pos)
    ParquetFiles.writeOne(
      spark.read.schema(sparkSchema(meta0)).parquet(dataFiles: _*)
        .select(col("*"),
          col("_metadata.file_path").as("_gf"), col("_metadata.row_index").as("_gp"))
        .filter(predicate)
        .select(col("_gf").as("file_path"), col("_gp").as("pos"))
        .orderBy(col("file_path"), col("pos")), delFile)
    val nDeletes = spark.read.parquet(delFile).count()
    OptimisticCommit.commit(tableDir, (base, basePath) => {
      val snapId = (base.snapshots.map(_.snapshotId) :+ 0L).max + 1
      val attempt = java.util.UUID.randomUUID() // see append: racing-safe names
      val manifest = s"$tableDir/m-delete-$snapId-$attempt.avro"
      ManifestWriter.write(manifest, Seq(ManifestWriter.EntryData(
        1, snapId, delFile, nDeletes, ParquetFiles.length(delFile),
        Map.empty, Map.empty, content = 1, sequenceNumber = Some(snapId))))
      val list = s"$tableDir/snap-$snapId-$attempt-list.avro"
      writeList(list, carryForward(base), manifest, 0, 1, snapId)
      MetadataWriter.commitSnapshot(base,
        Snapshot(snapId, base.currentSnapshotId, base.lastUpdatedMs + 1000,
          Some("delete"),
          Map("added-delete-files" -> "1", "added-position-deletes" -> nDeletes.toString),
          Some(list), base.currentSchemaId),
        Some(basePath))
    })
  }
}
