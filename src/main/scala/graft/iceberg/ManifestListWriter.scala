package graft.iceberg

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
    * manifest's partition data). Unlisted paths default to 0, so existing
    * call sites are unchanged. */
  def write(path: String, manifestPaths: Seq[String], snapshotId: Long,
      addedDataFilesCount: Int = 2, codec: String = "deflate",
      contents: Map[String, Int] = Map.empty,
      specIds: Map[String, Int] = Map.empty): Unit = {
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
      r.put("added_snapshot_id", snapshotId)
      r.put("added_data_files_count", addedDataFilesCount)
      r.put("content", contents.getOrElse(p, 0))
      w.append(r)
    } finally w.close()
  }
}
