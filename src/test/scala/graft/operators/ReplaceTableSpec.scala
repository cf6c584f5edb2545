package graft.operators

import graft.SparkSpec
import graft.iceberg.{GraftTable, TableMetadata}

/** The StagingTableCatalog contracts beyond what the i96 entry drives:
  * atomic-CTAS abort, plain REPLACE (no AS SELECT), field-id freshness
  * across the replace, property REPLACEMENT (not merge), partitioned
  * replace, the missing-table refusal, and the format-version pin. */
class ReplaceTableSpec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-rts-$tag").toString
    spark.conf.set(s"spark.sql.catalog.rts_$tag",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.rts_$tag.warehouse", wh)
    s"rts_$tag"
  }

  private def meta(wh: String, name: String): TableMetadata =
    TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/$name"))

  private def warehouse(cat: String): String =
    spark.conf.get(s"spark.sql.catalog.$cat.warehouse")

  test("failed atomic CTAS leaves no table behind") {
    val cat = freshCatalog("ctas")
    intercept[Throwable] {
      spark.sql(s"""CREATE TABLE $cat.db.boom AS
        SELECT CASE WHEN x > 0 THEN raise_error('planned') ELSE 0L END AS c
        FROM (SELECT 1 AS x)""")
    }
    assert(!spark.catalog.tableExists(s"$cat.db.boom"))
    assert(!new java.io.File(s"${warehouse(cat)}/db/boom/v1.metadata.json").exists(),
      "the aborted staged create must remove the directory")
  }

  test("plain REPLACE TABLE truncates to the new schema, history intact") {
    val cat = freshCatalog("plain")
    spark.sql(s"CREATE TABLE $cat.db.p AS SELECT 1 AS a, 'x' AS b")
    spark.sql(s"REPLACE TABLE $cat.db.p (x BIGINT, y STRING)")
    assert(spark.table(s"$cat.db.p").schema.fieldNames.toSeq == Seq("x", "y"))
    assert(spark.table(s"$cat.db.p").count() == 0)
    val m = meta(warehouse(cat), "p")
    assert(m.snapshots.size == 2, "CTAS append + replace truncate")
    // the pre-replace snapshot still reads its own rows under (a, b)
    val oldId = m.snapshots.minBy(_.snapshotId).snapshotId
    val old = spark.sql(s"SELECT * FROM $cat.db.p VERSION AS OF $oldId")
    assert(old.schema.fieldNames.toSeq == Seq("a", "b"))
    assert(old.collect().map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "x")))
  }

  test("replaced schema and spec allocate fresh ids above every historical one") {
    val cat = freshCatalog("ids")
    spark.sql(s"""CREATE TABLE $cat.db.f (a INT, b STRING, c DOUBLE)
      PARTITIONED BY (bucket(4, a))""")
    spark.sql(s"INSERT INTO $cat.db.f VALUES (1, 'x', 0.5)")
    // same column NAMES on purpose: the ids must still be fresh (old
    // snapshots keep the old schema; a reused id would alias columns)
    spark.sql(s"""CREATE OR REPLACE TABLE $cat.db.f
      PARTITIONED BY (bucket(8, a)) AS SELECT 2L AS a, 'y' AS b""")
    val m = meta(warehouse(cat), "f")
    assert(m.schemas.size == 2)
    val oldIds = m.schemas.minBy(_.schemaId).fields.map(_.id).toSet
    val newIds = m.currentSchema.fields.map(_.id).toSet
    assert(newIds.forall(_ > oldIds.max),
      s"new field ids $newIds must clear the historical max ${oldIds.max}")
    assert(m.partitionSpecs.size == 2)
    val specs = m.partitionSpecs.sortBy(_.specId)
    assert(specs.last.specId > specs.head.specId)
    assert(specs.last.fields.head.fieldId > specs.head.fields.head.fieldId)
    assert(specs.last.fields.head.transform == "bucket[8]")
    // and the new layout actually wrote + reads back
    assert(spark.table(s"$cat.db.f").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "y")))
  }

  test("REPLACE replaces properties — it is a new definition, not a patch") {
    val cat = freshCatalog("props")
    spark.sql(s"""CREATE TABLE $cat.db.pr (a INT)
      TBLPROPERTIES ('write.update.mode'='merge-on-read')""")
    spark.sql(s"CREATE OR REPLACE TABLE $cat.db.pr AS SELECT 1 AS a")
    assert(!meta(warehouse(cat), "pr").properties.contains("write.update.mode"),
      "a property from the old definition must not survive the replace")
  }

  test("REPLACE TABLE on a missing table refuses; format-version cannot change") {
    val cat = freshCatalog("guard")
    intercept[Throwable] {
      spark.sql(s"REPLACE TABLE $cat.db.nope AS SELECT 1 AS a")
    }
    spark.sql(s"CREATE TABLE $cat.db.v2 AS SELECT 1 AS a")
    val e = intercept[Throwable] {
      spark.sql(s"""CREATE OR REPLACE TABLE $cat.db.v2
        TBLPROPERTIES ('format-version'='3') AS SELECT 2 AS a""")
    }
    assert(e.getMessage.contains("format-version"), e.getMessage)
  }

  test("a schema evolution racing the staged replace refuses at commit") {
    import graft.iceberg._
    val cat = freshCatalog("race")
    spark.sql(s"CREATE TABLE $cat.db.r AS SELECT 1 AS a")
    val dir = s"${warehouse(cat)}/db/r"
    // ids staged against the pre-race base (schema-id 1, field id 2)
    val staged = IcebergSchema(1, Seq(IcebergField(2, "b", required = false, "long")))
    // the race: a concurrent ADD COLUMN claims schema-id 1 first
    spark.sql(s"ALTER TABLE $cat.db.r ADD COLUMN c STRING")
    val e = intercept[IllegalArgumentException] {
      GraftTable.commitReplaceTable(dir, staged,
        PartitionSpec(1, Nil), Map.empty, Nil)
    }
    assert(e.getMessage.contains("concurrently"), e.getMessage)
    // the refusal left the evolved table fully intact
    assert(spark.table(s"$cat.db.r").schema.fieldNames.toSeq == Seq("a", "c"))
  }

  test("gc.enabled=false survives a REPLACE — the fork's history still references the source") {
    import graft.iceberg._
    import org.apache.spark.sql.functions.col
    val cat = freshCatalog("gc")
    spark.sql(s"CREATE TABLE $cat.db.src AS SELECT 1 AS a, 'x' AS b")
    val srcDir = s"${warehouse(cat)}/db/src"
    val forkDir = s"${warehouse(cat)}/db/fork"
    GraftTable.snapshotTable(srcDir, forkDir)
    spark.sql(s"CREATE OR REPLACE TABLE $cat.db.fork AS SELECT 9L AS n")
    val m = meta(warehouse(cat), "fork")
    assert(m.properties.get("gc.enabled").contains("false"),
      s"ownership flag must survive the replace: ${m.properties}")
    // and therefore the cleanup that would touch the SOURCE's files
    // still refuses
    val e = intercept[IllegalArgumentException] {
      GraftTable.deleteReachableFiles(spark, GraftTable.latestMetadataPath(forkDir))
    }
    assert(e.getMessage.contains("gc.enabled"), e.getMessage)
    assert(spark.table(s"$cat.db.src").count() == 1, "source intact")
  }

  test("a tag read through GraftTable.read resolves the tagged snapshot's schema") {
    import graft.iceberg._
    import org.apache.spark.sql.functions.col
    val cat = freshCatalog("tag")
    spark.sql(s"CREATE TABLE $cat.db.t AS SELECT 1 AS a, 'x' AS b")
    val dir = s"${warehouse(cat)}/db/t"
    GraftTable.createTag(dir, "v1")
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN b TO label")
    val viaTag = GraftTable.read(spark, GraftTable.latestMetadataPath(dir),
      ref = Some("v1"))
    assert(viaTag.columns.toSeq == Seq("a", "b"),
      s"a tag is an archival point — old schema, got ${viaTag.columns.toSeq}")
    assert(viaTag.where(col("b") === "x").count() == 1)
    // head read keeps the current (renamed) schema
    assert(GraftTable.read(spark, GraftTable.latestMetadataPath(dir))
      .columns.toSeq == Seq("a", "label"))
  }

  test("replace over a dual-slot v1 document never duplicates a schema id") {
    import graft.iceberg._
    // the standard Iceberg-Java v1 form: the SAME schema in both the
    // top-level "schema" slot and the "schemas" list
    val dir = java.nio.file.Files.createTempDirectory("graft-dual").toString + "/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val schemaJson =
      """{"schema-id":0,"type":"struct","fields":[
        |{"id":1,"name":"k","required":false,"type":"int"}]}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/v1.metadata.json"),
      s"""{"format-version":1,"table-uuid":"b6b9a6a1-0000-4000-8000-00000000dua1",
         |"location":"$dir","last-updated-ms":1700000000000,
         |"schema":$schemaJson,"schemas":[$schemaJson],
         |"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
         |"sort-orders":[{"order-id":0,"fields":[]}],"default-sort-order-id":0,
         |"properties":{},"snapshots":[],"snapshot-log":[],"metadata-log":[]}
         |""".stripMargin)
    GraftTable.commitReplaceTable(dir,
      IcebergSchema(1, Seq(IcebergField(2, "v", required = false, "long"))),
      PartitionSpec(1, Nil), Map.empty, Nil)
    val after = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val ids = after.schemas.map(_.schemaId)
    assert(ids == ids.distinct, s"duplicate schema ids persisted: $ids")
    assert(ids.toSet == Set(0, 1))
    assert(after.currentSchema.fields.map(_.name) == Seq("v"))
  }

  test("no staged scratch document survives commit or abort") {
    val cat = freshCatalog("scratch")
    spark.sql(s"CREATE TABLE $cat.db.s AS SELECT 1 AS a")
    spark.sql(s"CREATE OR REPLACE TABLE $cat.db.s AS SELECT 2 AS a")
    intercept[Throwable] {
      spark.sql(s"""REPLACE TABLE $cat.db.s AS
        SELECT CASE WHEN x > 0 THEN raise_error('planned') ELSE 0L END AS c
        FROM (SELECT 1 AS x)""")
    }
    val leftovers = new java.io.File(s"${warehouse(cat)}/db/s").listFiles()
      .map(_.getName).filter(_.startsWith("staged-"))
    assert(leftovers.isEmpty, s"scratch documents leaked: ${leftovers.mkString(",")}")
    assert(spark.table(s"$cat.db.s").collect().map(_.getInt(0)).toSeq == Seq(2))
  }
}
