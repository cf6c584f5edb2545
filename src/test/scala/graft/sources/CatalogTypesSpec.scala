package graft.sources

import graft.SparkSpec
import graft.iceberg._

/** Edge-of-palette column types through the catalog and type lattice:
  * SMALLINT/TINYINT promote to Iceberg `int` at CREATE (the
  * Spark-Iceberg convention — Iceberg has no 8/16-bit integers), and a
  * FOREIGN table declaring `uuid` / `fixed[16]` columns parses, maps to
  * Spark string/binary, and round-trips its bound encodings through
  * SingleValueCodec (the reference's own uuid/fixed decode surface —
  * IcebergDatumWriter.java bound decoding). */
class CatalogTypesSpec extends SparkSpec {

  test("SMALLINT/TINYINT columns promote to int and round-trip values") {
    val wh = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-spec-types-${graft.Scratch.procToken}").toString
    graft.TmpOutputs.deleteRecursively(java.nio.file.Paths.get(wh))
    spark.conf.set("spark.sql.catalog.g_typ",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g_typ.warehouse", wh)
    spark.sql("CREATE TABLE g_typ.db.t (k SMALLINT, b TINYINT, s STRING)")
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/t"))
    assert(meta.currentSchema.fields.map(_.fieldType) == Seq("int", "int", "string"))
    spark.sql("INSERT INTO g_typ.db.t VALUES (CAST(7 AS SMALLINT), CAST(3 AS TINYINT), 'x')")
    val row = spark.sql("SELECT k, b, s FROM g_typ.db.t").head()
    assert(row.getInt(0) == 7 && row.getInt(1) == 3 && row.getString(2) == "x")
  }

  test("column comments persist as Iceberg doc and surface through DESCRIBE") {
    val wh = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-spec-doc-${graft.Scratch.procToken}").toString
    graft.TmpOutputs.deleteRecursively(java.nio.file.Paths.get(wh))
    spark.conf.set("spark.sql.catalog.g_doc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g_doc.warehouse", wh)
    spark.sql("""CREATE TABLE g_doc.db.t
      (k INT COMMENT 'the key', v STRING)""")
    val meta0 = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/t"))
    assert(meta0.currentSchema.fields.map(_.doc) == Seq(Some("the key"), None))
    spark.sql("ALTER TABLE g_doc.db.t ALTER COLUMN v COMMENT 'the value'")
    val meta1 = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/t"))
    assert(meta1.currentSchema.fields.map(_.doc) ==
      Seq(Some("the key"), Some("the value")))
    // DESCRIBE surfaces the doc as the column comment
    val desc = spark.sql("DESCRIBE TABLE g_doc.db.t").collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(desc.get("k").contains("the key") && desc.get("v").contains("the value"),
      desc.toString)
    // the doc survives unrelated schema evolution (copy() paths)
    spark.sql("ALTER TABLE g_doc.db.t ADD COLUMN w INT")
    val meta2 = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/t"))
    assert(meta2.currentSchema.fields.map(_.doc) ==
      Seq(Some("the key"), Some("the value"), None))
  }

  test("add_files promotes narrower-physical footer stats under widened columns") {
    import spark.implicits._
    val wh = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-spec-widen-${graft.Scratch.procToken}").toString
    graft.TmpOutputs.deleteRecursively(java.nio.file.Paths.get(wh))
    spark.conf.set("spark.sql.catalog.g_wdn", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g_wdn.warehouse", wh)
    // the staged file carries INT32/FLOAT physicals; the table declares
    // BIGINT/DOUBLE — the footer-stat import must promote, not crash
    Seq((1, 0.5f), (2, 1.5f), (3, 2.5f)).toDF("k", "bal")
      .coalesce(1).write.parquet(s"$wh/staging")
    spark.sql("CREATE TABLE g_wdn.db.t (k BIGINT, bal DOUBLE)")
    spark.sql(s"CALL g_wdn.system.add_files(table => 'db.t', source_dir => '$wh/staging')")
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/t"))
    val entry = meta.currentSnapshot.flatMap(_.manifestList).toSeq
      .flatMap(ManifestListReader.read).filter(_.content == 0)
      .flatMap(i => ManifestWriter.read(i.path)).head
    assert(SingleValueCodec.decode(IcebergTypes.TLong, entry.lowerBounds(1)) == 1L)
    assert(SingleValueCodec.decode(IcebergTypes.TLong, entry.upperBounds(1)) == 3L)
    val got = spark.sql("SELECT CAST(SUM(k) AS BIGINT), SUM(bal) FROM g_wdn.db.t").head()
    assert(got.getLong(0) == 6L && got.getDouble(1) == 4.5)
  }

  test("foreign nested ORC files import with correctly-addressed column stats") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orcnested").toString
    val f = s"$dir/n.orc"
    // struct<a:struct<x:int>, b:int> — b's statistics index is its
    // FLATTENED column id (3), not its field ordinal + 1 (2)
    val orc = org.apache.orc.TypeDescription.fromString("struct<a:struct<x:int>,b:int>")
    val conf = HadoopConfs.active()
    val w = org.apache.orc.OrcFile.createWriter(new org.apache.hadoop.fs.Path(f),
      org.apache.orc.OrcFile.writerOptions(conf).setSchema(orc).overwrite(true))
    val batch = orc.createRowBatch()
    val a = batch.cols(0).asInstanceOf[org.apache.hadoop.hive.ql.exec.vector.StructColumnVector]
    val x = a.fields(0).asInstanceOf[org.apache.hadoop.hive.ql.exec.vector.LongColumnVector]
    val b = batch.cols(1).asInstanceOf[org.apache.hadoop.hive.ql.exec.vector.LongColumnVector]
    (0 until 3).foreach { i =>
      x.vector(i) = i.toLong        // a.x spans [0, 2]
      b.vector(i) = 50L + i         // b spans [50, 52]
      batch.size += 1
    }
    w.addRowBatch(batch); w.close()
    val (rows, lower, upper) = {
      val m = OrcDataFiles.footerStats(f, Seq(
        IcebergField(1, "b", required = false, "int")))
      m
    }
    assert(rows == 3L)
    assert(SingleValueCodec.decode(IcebergTypes.TInt, lower(1)) == 50)
    assert(SingleValueCodec.decode(IcebergTypes.TInt, upper(1)) == 52,
      "b must carry ITS bounds, not the nested a.x's")
  }

  test("foreign uuid/fixed columns parse, map, and round-trip bounds") {
    val uuidStr = "f79c3e09-677c-4bbd-a479-3f349cb785e7"
    val doc = TableMetadata(
      formatVersion = 2, tableUuid = uuidStr, location = "/tmp/x",
      lastUpdatedMs = 0L, topLevelSchema = None, currentSchemaId = Some(0),
      schemas = Seq(IcebergSchema(0, Seq(
        IcebergField(1, "id", required = false, "uuid"),
        IcebergField(2, "digest", required = false, "fixed[16]"),
        IcebergField(3, "payload", required = false, "binary")))),
      partitionSpecs = Nil, defaultSpecId = 0, sortOrders = Nil,
      defaultSortOrderId = 0, properties = Map.empty, currentSnapshotId = None,
      refs = Nil, snapshots = Nil, snapshotLog = Nil, metadataLog = Nil)
    val schema = GraftTable.sparkSchema(doc)
    assert(schema("id").dataType == org.apache.spark.sql.types.StringType)
    assert(schema("digest").dataType == org.apache.spark.sql.types.BinaryType)
    // bound-encoding round trips: uuid = 16 bytes big-endian, fixed = raw
    val u = java.util.UUID.fromString(uuidStr)
    val encU = SingleValueCodec.encode(IcebergTypes.TUuid, u)
    assert(encU.length == 16)
    assert(SingleValueCodec.decode(IcebergTypes.TUuid, encU) == u)
    val raw = Array.tabulate[Byte](16)(_.toByte)
    val encF = SingleValueCodec.encode(IcebergTypes.TFixed(16), raw)
    assert(SingleValueCodec.decode(IcebergTypes.TFixed(16), encF)
      .asInstanceOf[Array[Byte]].toSeq == raw.toSeq)
  }
}
