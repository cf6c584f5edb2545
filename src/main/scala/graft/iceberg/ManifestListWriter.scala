package graft.iceberg

import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.SchemaBuilder
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

/** Manifest-list sink: writes a snapshot's manifest-list Avro container
  * (the `manifest_file` record set Iceberg stores per snapshot — the core
  * v1 fields; see the fixture metadata's `manifest-list` pointer,
  * /root/reference/src/test/resources/v1.metadata.json). The reference
  * only READS containers; the writer completes the two-level planning
  * chain (snapshot → manifest-list → manifests → files) for tables whose
  * list file is absent, and doubles as the library's Avro container sink.
  */
object ManifestListWriter {

  /** One per partition-spec field, in spec-field order: the manifest-level
    * partition summary (spec fields 509-511) a planner consults to skip an
    * ENTIRE manifest — and every file it lists — without opening it. This
    * is the top level of Iceberg's two-level pruning: at 100 TB a scan
    * touches thousands of manifests, and list-level summaries keep the
    * metadata read proportional to the matching manifests, not the table. */
  final case class FieldSummary(
      containsNull: Boolean, lower: Array[Byte], upper: Array[Byte])

  private val fieldSummarySchema: Schema =
    SchemaBuilder.record("r508").fields()
      .name("contains_null").prop(AvroConversions.FieldIdKey, "509")
      .`type`().booleanType().noDefault()
      .name("lower_bound").prop(AvroConversions.FieldIdKey, "510")
      .`type`().unionOf().nullType().and().bytesType().endUnion().nullDefault()
      .name("upper_bound").prop(AvroConversions.FieldIdKey, "511")
      .`type`().unionOf().nullType().and().bytesType().endUnion().nullDefault()
      .endRecord()

  /** The spec field-ids (500-504) ride on every field as `field-id`
    * props — real Iceberg readers resolve manifest-list columns by id,
    * not name, so a list file without them is only readable by name-based
    * readers like our own MetadataTables. Same interop posture as
    * ManifestWriter.entrySchema. */
  val manifestFileSchema: org.apache.avro.Schema =
    SchemaBuilder.record("manifest_file").fields()
      .name("manifest_path").prop(AvroConversions.FieldIdKey, "500")
      .`type`().stringType().noDefault()
      .name("manifest_length").prop(AvroConversions.FieldIdKey, "501")
      .`type`().longType().noDefault()
      .name("partition_spec_id").prop(AvroConversions.FieldIdKey, "502")
      .`type`().intType().noDefault()
      .name("added_snapshot_id").prop(AvroConversions.FieldIdKey, "503")
      .`type`().longType().noDefault()
      .name("added_data_files_count").prop(AvroConversions.FieldIdKey, "504")
      .`type`().intType().noDefault()
      // v2 routing field (spec id 517): 0 = data manifests, 1 = delete
      // manifests — scan planning reads THIS to know which manifests hold
      // position/equality delete files (the i22 DML write path)
      .name("content").prop(AvroConversions.FieldIdKey, "517")
      .`type`().intType().intDefault(0)
      // v2 sequence numbers (spec ids 515/516): the manifest's own data
      // sequence number — what an entry-level null `sequence_number`
      // INHERITS (a v2 writer leaves ADDED entries null and lets the list
      // carry the commit's number) — and the minimum across its live
      // entries, the coordinate delete-manifest pruning compares against.
      // Default 0 keeps pre-field lists readable (Avro field defaults).
      .name("sequence_number").prop(AvroConversions.FieldIdKey, "515")
      .`type`().longType().longDefault(0)
      .name("min_sequence_number").prop(AvroConversions.FieldIdKey, "516")
      .`type`().longType().longDefault(0)
      // partition summaries (spec field 507): one field_summary per
      // partition-spec field, the list-level pruning dimension
      .name("partitions").prop(AvroConversions.FieldIdKey, "507")
      .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL),
        Schema.createArray(fieldSummarySchema))).withDefault(null)
      .endRecord()

  /** Manifest size for the manifest_length field, resolved through the
    * session's Hadoop FileSystem conf (HadoopConfs) — so hdfs:// / s3a://
    * manifests see the session's credentials/settings and record their
    * true length instead of the silent 0 a java.io.File fallback would
    * produce. */
  private def manifestLength(p: String): Long =
    HadoopConfs.fileSystemFor(p).getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen

  /** `contents` marks delete manifests (path → 1); `specIds` records each
    * manifest's partition-spec id (spec evolution leaves manifests written
    * under older specs in place — readers must know which spec shaped each
    * manifest's partition data). `addedSnapshotIds`/`addedCounts` preserve
    * per-manifest provenance: a carried-forward manifest keeps the snapshot
    * that originally added it (spec field 503), so list-level incremental
    * planning (filter manifests by added_snapshot_id) stays sound across
    * commits that re-list older manifests. Unlisted paths fall back to the
    * committing snapshot / uniform count, so append-only call sites are
    * unchanged. */
  /** `seqNums`/`minSeqNums` carry each manifest's v2 sequence numbers
    * (fields 515/516): a carried-forward manifest keeps its ORIGINAL
    * commit's number so entry-level inheritance stays correct across
    * re-listing commits. Unlisted paths default to `snapshotId` — this
    * library assigns sequence numbers equal to snapshot ids (a strictly
    * increasing linear history), so the committing snapshot's id IS the
    * new manifest's sequence number. */
  def write(path: String, manifestPaths: Seq[String], snapshotId: Long,
      addedDataFilesCount: Int = 2, codec: String = "deflate",
      contents: Map[String, Int] = Map.empty,
      specIds: Map[String, Int] = Map.empty,
      summaries: Map[String, Seq[FieldSummary]] = Map.empty,
      addedSnapshotIds: Map[String, Long] = Map.empty,
      addedCounts: Map[String, Int] = Map.empty,
      seqNums: Map[String, Long] = Map.empty,
      minSeqNums: Map[String, Long] = Map.empty): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](manifestFileSchema))
    w.setCodec(org.apache.avro.file.CodecFactory.fromString(codec))
    w.create(manifestFileSchema, HadoopConfs.fileSystemFor(path)
      .create(new org.apache.hadoop.fs.Path(path), true))
    try manifestPaths.foreach { p =>
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", p)
      r.put("manifest_length", manifestLength(p))
      r.put("partition_spec_id", specIds.getOrElse(p, 0))
      r.put("added_snapshot_id", addedSnapshotIds.getOrElse(p, snapshotId))
      r.put("added_data_files_count", addedCounts.getOrElse(p, addedDataFilesCount))
      r.put("content", contents.getOrElse(p, 0))
      r.put("sequence_number", seqNums.getOrElse(p, snapshotId))
      r.put("min_sequence_number",
        minSeqNums.getOrElse(p, seqNums.getOrElse(p, snapshotId)))
      summaries.get(p).foreach { fs =>
        val arrSchema = manifestFileSchema.getField("partitions")
          .schema().getTypes.get(1)
        val arr = new GenericData.Array[GenericRecord](
          arrSchema, java.util.Collections.emptyList[GenericRecord]())
        fs.foreach { s =>
          val rec = new GenericData.Record(fieldSummarySchema)
          rec.put("contains_null", s.containsNull)
          rec.put("lower_bound", ByteBuffer.wrap(s.lower))
          rec.put("upper_bound", ByteBuffer.wrap(s.upper))
          arr.add(rec)
        }
        r.put("partitions", arr)
      }
      w.append(r)
    } finally w.close()
  }
}
