package graft.iceberg

import graft.SparkSpec
import graft.operators.IcebergQueries

/** Two-level planning chain: snapshot → manifest-list → manifests → files.
  * The golden fixture ships no manifest-list file, so one is synthesized
  * pointing at the real fixture manifest. Also exercises the generic
  * graft-avro DSv2 source on a non-manifest container. */
class ManifestListSpec extends SparkSpec {

  private def writeManifestList(path: String, manifestPaths: Seq[String]): Unit =
    ManifestListWriter.write(path, manifestPaths, 8115727803695877401L)

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

    // manifest_length must be the real byte size (Hadoop FS stat), and the
    // written schema must carry the spec field-ids (500-504) so id-based
    // Iceberg readers can resolve the columns
    val len = manifestsDf.select("manifest_length").head.getLong(0)
    assert(len == new java.io.File(IcebergQueries.FixtureManifest).length() && len > 0,
      s"manifest_length $len != on-disk size")
    val fieldIds = ManifestListWriter.manifestFileSchema.getFields
    assert((0 until fieldIds.size).map(i => fieldIds.get(i).getProp(AvroConversions.FieldIdKey)) ==
      Seq("500", "501", "502", "503", "504", "517", "515", "516", "507"))
  }

  test("partition summaries (field 507) round-trip through the manifests table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mlist-507").toString
    val listPath = s"$dir/snap-list.avro"
    val m = IcebergQueries.FixtureManifest
    ManifestListWriter.write(listPath, Seq(m), 1L,
      summaries = Map(m -> Seq(ManifestListWriter.FieldSummary(
        containsNull = true,
        lower = Array[Byte](1, 0, 0, 0),
        upper = Array[Byte](9, 0, 0, 0)))))

    val row = MetadataTables.manifests(spark, listPath)
      .selectExpr("partitions[0].contains_null as cn",
        "partitions[0].lower_bound as lo", "partitions[0].upper_bound as hi")
      .head()
    assert(row.getBoolean(0))
    assert(row.getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 0, 0, 0))
    assert(row.getAs[Array[Byte]](2).toSeq == Seq[Byte](9, 0, 0, 0))
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
