package graft.iceberg

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec
import graft.cli.{Main, ManifestToJsonTool, MetadataToJsonTool}
import graft.operators.IcebergQueries

/** Golden-fixture assertions against the reference's own test inputs —
  * with real assertions, unlike the reference's no-assert smoke test
  * (SURVEY.md §5). Ground truth from FIXTURES.md (decoded in-session). */
class IcebergSpec extends SparkSpec {

  private val meta = TableMetadata.parseFile(IcebergQueries.FixtureMetadata)

  test("metadata parse: field-id dictionary matches reference test (1→long, 2→string)") {
    // Parity with TestDataFileTools.testReadMetaData assertions.
    assert(meta.fieldTypes == Map(1 -> "long", 2 -> "string"))
    assert(meta.currentSchema.schemaId == 0)
    assert(meta.formatVersion == 1)
    assert(meta.currentSnapshotId.contains(8115727803695877401L))
    assert(meta.refs.map(_.name) == Seq("main"))
    assert(meta.partitionSpecs.head.fields.map(_.transform) == Seq("identity"))
  }

  test("metadata parse: falls back to schemas[current-schema-id] without top-level schema") {
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(IcebergQueries.FixtureMetadata)))
    val noTop = json.replaceFirst("\"schema\" :", "\"schema-ignored\" :")
    val m = TableMetadata.parse(noTop)
    assert(m.fieldTypes == Map(1 -> "long", 2 -> "string"))
  }

  test("manifest scan: two entries with fixture ground truth") {
    val df = ManifestReader.entries(spark, Seq(IcebergQueries.FixtureManifest))
    val rows = df.orderBy(df.col("data_file.file_path")).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Int]("status") == 1))
    assert(rows.forall(_.getAs[Long]("snapshot_id") == 8115727803695877401L))
    val df1 = rows(0).getAs[org.apache.spark.sql.Row]("data_file")
    assert(df1.getAs[String]("file_format") == "PARQUET")
    assert(df1.getAs[Long]("record_count") == 1L)
    assert(df1.getAs[scala.collection.Seq[Long]]("split_offsets").toSeq == Seq(4L))
  }

  test("decoded bounds: long 1/2 and string a/b (the signature operator)") {
    val rows = IcebergQueries.i01ManifestFiles(spark, sfDir).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("lower_id") == "value:1;type:long")
    assert(rows(0).getAs[String]("lower_data") == "value:a;type:string")
    assert(rows(1).getAs[String]("upper_id") == "value:2;type:long")
    assert(rows(1).getAs[String]("upper_data") == "value:b;type:string")
    assert(rows(0).getAs[String]("partition_data") == "a")
  }

  test("snapshots metadata table matches fixture summary") {
    val r = IcebergQueries.i02Snapshots(spark, sfDir).collect().head
    assert(r.getAs[Long]("snapshot_id") == 8115727803695877401L)
    assert(r.getAs[String]("operation") == "append")
    assert(r.getAs[Long]("added_data_files") == 2L)
    assert(r.getAs[Long]("total_files_size") == 1315L)
  }

  test("stats pruning keeps only the file whose bounds admit id >= 2") {
    val rows = IcebergQueries.i03PrunedScan(spark, sfDir).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("file_path").contains("data=b"))
  }

  test("manifest2json CLI emits valid JSON with decoded bounds; --head limits") {
    val outBuf = new java.io.ByteArrayOutputStream()
    val rc = new ManifestToJsonTool().run(spark, System.in,
      new java.io.PrintStream(outBuf, true, "UTF-8"), System.err,
      Seq(IcebergQueries.FixtureManifest, IcebergQueries.FixtureMetadata))
    assert(rc == 0)
    val json = outBuf.toString("UTF-8")
    val tree = new ObjectMapper().readTree(json) // throws if invalid
    assert(tree.isArray && tree.size() == 2)
    assert(tree.get(0).get("data_file").get("lower_bounds").get("1").asText() == "value:1;type:long")

    // --head=1 must still produce VALID json (reference emits a trailing
    // comma here — quirk fixed per SURVEY.md §2.1).
    val headBuf = new java.io.ByteArrayOutputStream()
    val rc2 = new ManifestToJsonTool().run(spark, System.in,
      new java.io.PrintStream(headBuf, true, "UTF-8"), System.err,
      Seq("--head=1", IcebergQueries.FixtureManifest, IcebergQueries.FixtureMetadata))
    assert(rc2 == 0)
    val headTree = new ObjectMapper().readTree(headBuf.toString("UTF-8"))
    assert(headTree.isArray && headTree.size() == 1)
  }

  test("manifest from stdin ('-') matches the file-path read") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(IcebergQueries.FixtureManifest))
    val outBuf = new java.io.ByteArrayOutputStream()
    val rc = new ManifestToJsonTool().run(spark,
      new java.io.ByteArrayInputStream(bytes),
      new java.io.PrintStream(outBuf, true, "UTF-8"), System.err,
      Seq("-", IcebergQueries.FixtureMetadata))
    assert(rc == 0)
    val tree = new ObjectMapper().readTree(outBuf.toString("UTF-8"))
    assert(tree.isArray && tree.size() == 2)
  }

  test("reader-schema projection narrows the output columns") {
    // project manifest_entry to just status via an Avro reader schema
    val readerSchema =
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int","field-id":0}]}""".stripMargin
    val df = ManifestReader.entries(spark,
      Seq(IcebergQueries.FixtureManifest), Some(readerSchema))
    assert(df.columns.toSeq == Seq("status"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 1))
  }

  test("DSv2 source: reads entries and prunes columns into the Avro decode") {
    val df = spark.read.format("graft-manifest").load(IcebergQueries.FixtureManifest)
    assert(df.schema.fieldNames.toSeq == Seq("status", "snapshot_id", "data_file"))
    val pruned = df.select("status")
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(scanDesc.contains("graft-manifest scan, ReadSchema: struct<status:int>"),
      s"expected pruned v2 scan in:\n$scanDesc")
    assert(pruned.collect().map(_.getInt(0)).toSeq == Seq(1, 1))
    // full read through v2 matches the v1 reader
    val v2 = IcebergQueries.i06Dsv2Scan(spark, sfDir).collect()
    assert(v2.length == 2)
    assert(v2.map(_.getAs[Long]("record_count")).toSeq == Seq(1L, 1L))
  }

  test("DSv2 source: NESTED pruning reaches into data_file") {
    val df = spark.read.format("graft-manifest").load(IcebergQueries.FixtureManifest)
      .select(org.apache.spark.sql.functions.col("data_file.file_path"))
    val plan = df.queryExecution.executedPlan.toString
    // the pruned read schema must contain only file_path inside data_file
    assert(plan.contains("struct<data_file:struct<file_path:string>>"),
      s"nested pruning missing in:\n$plan")
    val paths = df.collect().map(_.getString(0))
    assert(paths.length == 2 && paths.forall(_.endsWith(".parquet")))
  }

  test("CLI dispatch: unknown tool prints listing and exits 1") {
    val errBuf = new java.io.ByteArrayOutputStream()
    val rc = Main.run(spark, new java.io.PrintStream(errBuf),
      new java.io.PrintStream(errBuf), Seq("nosuchtool"))
    assert(rc == 1)
    assert(errBuf.toString.contains("manifest2json"))
  }

  test("metadata2json: snapshots table as valid JSON; unknown table rejected") {
    val outBuf = new java.io.ByteArrayOutputStream()
    val rc = Main.run(spark, new java.io.PrintStream(outBuf),
      new java.io.PrintStream(outBuf),
      Seq("metadata2json", graft.operators.IcebergQueries.FixtureMetadata))
    assert(rc == 0)
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(outBuf.toString)
    assert(tree.isArray && tree.size() == 1, s"expected 1 snapshot: $tree")
    assert(tree.get(0).get("snapshot_id").asLong() == 8115727803695877401L)

    val errBuf = new java.io.ByteArrayOutputStream()
    val rc2 = new MetadataToJsonTool().run(spark, System.in,
      new java.io.PrintStream(errBuf), new java.io.PrintStream(errBuf),
      Seq("--table", "nope", graft.operators.IcebergQueries.FixtureMetadata))
    assert(rc2 == 1 && errBuf.toString.contains("Unknown metadata table"))
  }

  test("missing metadata/manifest files fail gracefully with rc=1") {
    val errBuf = new java.io.ByteArrayOutputStream()
    val rc = new ManifestToJsonTool().run(spark, System.in,
      new java.io.PrintStream(errBuf), new java.io.PrintStream(errBuf),
      Seq("/nope/manifest.avro", "/nope/metadata.json"))
    assert(rc == 1)
    assert(errBuf.toString.contains("manifest2json:"))
  }

  test("negative --head is rejected with exit 1") {
    val errBuf = new java.io.ByteArrayOutputStream()
    val rc = new ManifestToJsonTool().run(spark, System.in,
      new java.io.PrintStream(errBuf), new java.io.PrintStream(errBuf),
      Seq("--head=-3", IcebergQueries.FixtureManifest, IcebergQueries.FixtureMetadata))
    assert(rc == 1)
  }
}
