package graft.iceberg

import org.apache.avro.SchemaBuilder
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.SparkSpec
import graft.operators.IcebergQueries

/** Two-level planning chain: snapshot → manifest-list → manifests → files.
  * The golden fixture ships no manifest-list file, so one is synthesized
  * pointing at the real fixture manifest. Also exercises the generic
  * graft-avro DSv2 source on a non-manifest container. */
class ManifestListSpec extends SparkSpec {

  private val manifestFileSchema = SchemaBuilder.record("manifest_file").fields()
    .name("manifest_path").`type`().stringType().noDefault()
    .name("manifest_length").`type`().longType().noDefault()
    .name("partition_spec_id").`type`().intType().noDefault()
    .name("added_snapshot_id").`type`().longType().noDefault()
    .name("added_data_files_count").`type`().intType().noDefault()
    .endRecord()

  private def writeManifestList(path: String, manifestPaths: Seq[String]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](manifestFileSchema))
    w.create(manifestFileSchema, new java.io.File(path))
    manifestPaths.foreach { p =>
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", p)
      r.put("manifest_length", new java.io.File(p).length())
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", 8115727803695877401L)
      r.put("added_data_files_count", 2)
      w.append(r)
    }
    w.close()
  }

  test("snapshot -> manifest-list -> manifests -> files chain resolves") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mlist").toString
    val listPath = s"$dir/snap-list.avro"
    writeManifestList(listPath, Seq(IcebergQueries.FixtureManifest))

    val meta = TableMetadata.parseFile(IcebergQueries.FixtureMetadata)
    val snap = meta.currentSnapshot.get.copy(manifestList = Some(listPath))

    val manifestsDf = MetadataTables.manifests(spark, listPath)
    assert(manifestsDf.count() == 1)
    assert(manifestsDf.select("manifest_path").head.getString(0) == IcebergQueries.FixtureManifest)

    val files = MetadataTables.filesForSnapshot(spark, meta, snap)
      .orderBy(org.apache.spark.sql.functions.col("file_path")).collect()
    assert(files.length == 2)
    assert(files(0).getAs[Map[Int, String]]("lower_bounds")(1) == "value:1;type:long")
  }

  test("graft-avro DSv2 source reads arbitrary Avro containers with pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-src").toString
    val listPath = s"$dir/list.avro"
    writeManifestList(listPath, Seq(IcebergQueries.FixtureManifest))

    val df = spark.read.format("graft-avro").load(listPath)
    assert(df.schema.fieldNames.contains("manifest_length"))
    val pruned = df.select("manifest_path", "added_data_files_count")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<manifest_path:string,added_data_files_count:int>"),
      s"pruning missing in:\n$plan")
    assert(pruned.head.getInt(1) == 2)
  }
}
