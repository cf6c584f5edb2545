package graft.sources

import graft.SparkSpec
import graft.iceberg._

/** Iceberg v3 VARIANT columns end-to-end: the catalog persists the spec
  * type name, the DSv2 task writer lands Spark's unshredded parquet
  * variant group (VARIANT-annotated, metadata+value binary halves), the
  * row-route reader reassembles VariantVal (variant is outside the
  * vectorized palette by design), `variant_get`/`parse_json` work over
  * the scan, DML (DELETE/UPDATE) composes, and the v3 gate holds
  * (variant on a v2 table refuses at DDL time). */
class VariantSpec extends SparkSpec {

  private def freshCatalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-$name").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  test("variant round-trips: write, scan, variant_get, DML") {
    val wh = freshCatalog("var1")
    spark.sql("CREATE TABLE var1.db.t (k BIGINT, payload VARIANT) " +
      "TBLPROPERTIES ('format-version'='3', 'commit-timestamp-ms'='1700000000000')")
    val dir = s"$wh/db/t"
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    assert(meta.currentSchema.fields.find(_.name == "payload")
      .exists(_.fieldType == "variant"), "catalog must persist the spec type name")

    spark.sql("""INSERT INTO var1.db.t
      SELECT id, parse_json(concat('{"a":', id, ',"b":"s', id, '",',
        '"nested":{"c":', id * 2, '}}'))
      FROM range(0, 50)""")
    // typed extraction through the scan
    val got = spark.sql("""SELECT k, variant_get(payload, '$.a', 'bigint') AS a,
        variant_get(payload, '$.b', 'string') AS b,
        variant_get(payload, '$.nested.c', 'bigint') AS c
      FROM var1.db.t ORDER BY k""").collect()
    assert(got.length == 50)
    got.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == k && r.getString(2) == s"s$k" && r.getLong(3) == 2 * k)
    }
    // a missing path is a variant null
    assert(spark.sql("SELECT count(*) FROM var1.db.t " +
      "WHERE variant_get(payload, '$.zzz', 'bigint') IS NULL")
      .head().getLong(0) == 50L)
    // DML over a variant table (v3: deletes are DVs)
    spark.sql("DELETE FROM var1.db.t WHERE k < 10")
    assert(spark.sql("SELECT count(*), sum(variant_get(payload, '$.a', 'bigint')) " +
      "FROM var1.db.t").head() ==
      org.apache.spark.sql.Row(40L, (10L until 50L).sum))
    // the parquet footprint really is the annotated unshredded group
    val dataFile = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
      .currentSnapshot.toSeq
      .flatMap(s => ManifestListReader.read(s.manifestList.get))
      .filter(_.content == 0).flatMap(i => ManifestWriter.read(i.path))
      .filter(e => e.status != 2 && e.content == 0).head.filePath
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(dataFile),
        new org.apache.hadoop.conf.Configuration()))
    try {
      val schema = footer.getFileMetaData.getSchema
      val t = schema.getType(schema.getFieldIndex("payload"))
      assert(!t.isPrimitive)
      assert(String.valueOf(t.getLogicalTypeAnnotation).toLowerCase.contains("variant"),
        s"payload group not VARIANT-annotated: ${t.getLogicalTypeAnnotation}")
    } finally footer.close()
  }

  test("native route and compaction preserve variant content") {
    val wh = freshCatalog("var2")
    spark.sql("CREATE TABLE var2.db.t (k BIGINT, payload VARIANT) " +
      "TBLPROPERTIES ('format-version'='3', 'commit-timestamp-ms'='1700000000000')")
    spark.sql("""INSERT INTO var2.db.t
      SELECT id, parse_json(concat('{"v":', id, '}')) FROM range(0, 30)""")
    spark.sql("""INSERT INTO var2.db.t
      SELECT id, parse_json(concat('{"v":', id, '}')) FROM range(30, 60)""")
    val dir = s"$wh/db/t"
    // native DataFrame route reads the annotated group as VariantType
    val native = GraftTable.read(spark, GraftTable.latestMetadataPath(dir))
    assert(native.schema("payload").dataType ==
      org.apache.spark.sql.types.VariantType)
    assert(native.selectExpr("sum(variant_get(payload, '$.v', 'bigint'))")
      .head().getLong(0) == (0L until 60L).sum)
    // compaction rewrites through Spark's own parquet writer — content survives
    spark.sql("CALL var2.system.rewrite_data_files(table => 'db.t')")
    assert(spark.sql("SELECT sum(variant_get(payload, '$.v', 'bigint')), count(*) " +
      "FROM var2.db.t").head() ==
      org.apache.spark.sql.Row((0L until 60L).sum, 60L))
  }

  test("variant refuses on v2 tables at DDL time") {
    freshCatalog("var3")
    intercept[Exception](spark.sql(
      "CREATE TABLE var3.db.bad (k BIGINT, p VARIANT) " +
        "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')"))
    spark.sql("CREATE TABLE var3.db.t2 (k BIGINT) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    intercept[Exception](spark.sql(
      "ALTER TABLE var3.db.t2 ADD COLUMN p VARIANT"))
    spark.sql("ALTER TABLE var3.db.t2 SET TBLPROPERTIES ('format-version'='3')")
    spark.sql("ALTER TABLE var3.db.t2 ADD COLUMN p VARIANT") // now fine
    spark.sql("INSERT INTO var3.db.t2 SELECT 1, parse_json('{\"x\":7}')")
    assert(spark.sql("SELECT variant_get(p, '$.x', 'int') FROM var3.db.t2")
      .head().getInt(0) == 7)
  }
}
