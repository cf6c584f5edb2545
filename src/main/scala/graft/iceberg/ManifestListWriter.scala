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

  val manifestFileSchema: org.apache.avro.Schema =
    SchemaBuilder.record("manifest_file").fields()
      .name("manifest_path").`type`().stringType().noDefault()
      .name("manifest_length").`type`().longType().noDefault()
      .name("partition_spec_id").`type`().intType().noDefault()
      .name("added_snapshot_id").`type`().longType().noDefault()
      .name("added_data_files_count").`type`().intType().noDefault()
      .endRecord()

  /** Manifest size for the manifest_length field — `file:` URIs resolve
    * through java.net.URI (a plain java.io.File on "file:/x" silently
    * reports 0 bytes). */
  private def manifestLength(p: String): Long =
    try {
      val uri = new java.net.URI(p)
      if (uri.getScheme == "file") new java.io.File(uri).length()
      else new java.io.File(p).length()
    } catch { case _: Exception => new java.io.File(p).length() }

  def write(path: String, manifestPaths: Seq[String], snapshotId: Long,
      addedDataFilesCount: Int = 2): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](manifestFileSchema))
    w.create(manifestFileSchema, new java.io.File(path))
    try manifestPaths.foreach { p =>
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", p)
      r.put("manifest_length", manifestLength(p))
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", snapshotId)
      r.put("added_data_files_count", addedDataFilesCount)
      w.append(r)
    } finally w.close()
  }
}
