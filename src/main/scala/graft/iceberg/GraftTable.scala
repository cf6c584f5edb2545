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
}
