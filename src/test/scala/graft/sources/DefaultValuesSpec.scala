package graft.sources

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.iceberg.{GraftTable, TableMetadata}

/** Iceberg v3 column defaults through the SQL catalog: CREATE ... DEFAULT,
  * INSERT with omitted columns (Spark's analyzer fills write-default from
  * the CURRENT_DEFAULT metadata the schema surfaces), ADD COLUMN ...
  * DEFAULT making every PRE-EXISTING row read the default (initial-default
  * fill on the row and native routes — not null), SET/DROP DEFAULT
  * updating only the write default, and the metadata round-trip. */
class DefaultValuesSpec extends SparkSpec {

  test("defaults: create, omitted-insert, add-column backfill, set/drop") {
    val wh = java.nio.file.Files.createTempDirectory("graft-defaults").toString
    spark.conf.set("spark.sql.catalog.gdef", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdef.warehouse", wh)
    spark.sql("""CREATE TABLE gdef.db.t (
      k BIGINT,
      status STRING DEFAULT 'active',
      score INT DEFAULT 7)""")
    val dir = s"$wh/db/t"

    // CREATE persisted the defaults as v3 schema attributes
    val meta0 = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val statusF = meta0.currentSchema.fields.find(_.name == "status").get
    assert(statusF.writeDefault.contains("\"active\""), statusF.toString)
    assert(statusF.initialDefault.contains("\"active\""))

    // INSERT omitting defaulted columns: Spark fills from CURRENT_DEFAULT
    spark.sql("INSERT INTO gdef.db.t (k) VALUES (1)")
    spark.sql("INSERT INTO gdef.db.t VALUES (2, 'closed', 9)")
    spark.sql("INSERT INTO gdef.db.t (k, status) VALUES (3, DEFAULT)")
    val rows = spark.sql("SELECT k, status, score FROM gdef.db.t ORDER BY k").collect()
    assert(rows.toSeq == Seq(Row(1L, "active", 7), Row(2L, "closed", 9), Row(3L, "active", 7)))

    // ADD COLUMN with DEFAULT: rows 1-3 PREDATE the column — they must
    // read the default on every route, while post-evolution writes see
    // write-default on omission and explicit values otherwise
    spark.sql("ALTER TABLE gdef.db.t ADD COLUMN region STRING DEFAULT 'emea'")
    spark.sql("INSERT INTO gdef.db.t (k, region) VALUES (4, 'apac')")
    spark.sql("INSERT INTO gdef.db.t (k) VALUES (5)")
    val after = spark.sql("SELECT k, region FROM gdef.db.t ORDER BY k").collect()
    assert(after.toSeq == Seq(Row(1L, "emea"), Row(2L, "emea"), Row(3L, "emea"),
      Row(4L, "apac"), Row(5L, "emea")), after.mkString(", "))
    // the native route agrees (independent presence-probe + literal fill)
    val native = GraftTable.read(spark, GraftTable.latestMetadataPath(dir))
      .select("k", "region").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(native.toSeq == Seq((1L, "emea"), (2L, "emea"), (3L, "emea"),
      (4L, "apac"), (5L, "emea")))
    // a genuine NULL stays null — defaults only fill ABSENT columns
    spark.sql("INSERT INTO gdef.db.t (k, region) VALUES (6, NULL)")
    assert(spark.sql("SELECT region FROM gdef.db.t WHERE k = 6").head.isNullAt(0))

    // SET DEFAULT changes future writes only; pre-existing absent rows
    // keep reading the IMMUTABLE initial-default
    spark.sql("ALTER TABLE gdef.db.t ALTER COLUMN region SET DEFAULT 'amer'")
    spark.sql("INSERT INTO gdef.db.t (k) VALUES (7)")
    val mixed = spark.sql("SELECT k, region FROM gdef.db.t WHERE k IN (1, 7) ORDER BY k")
      .collect()
    assert(mixed.toSeq == Seq(Row(1L, "emea"), Row(7L, "amer")), mixed.mkString(", "))

    // DROP DEFAULT: omission now inserts null; old rows still defaulted
    spark.sql("ALTER TABLE gdef.db.t ALTER COLUMN region DROP DEFAULT")
    spark.sql("INSERT INTO gdef.db.t (k) VALUES (8)")
    assert(spark.sql("SELECT region FROM gdef.db.t WHERE k = 8").head.isNullAt(0))
    assert(spark.sql("SELECT region FROM gdef.db.t WHERE k = 1").head.getString(0) == "emea")

    // typed defaults round-trip (date + bigint), including the backfill
    spark.sql("ALTER TABLE gdef.db.t ADD COLUMN since DATE DEFAULT DATE'2020-06-01'")
    spark.sql("ALTER TABLE gdef.db.t ADD COLUMN hits BIGINT DEFAULT 42")
    val typed = spark.sql("SELECT since, hits FROM gdef.db.t WHERE k = 1").head
    assert(typed.getDate(0).toLocalDate == java.time.LocalDate.of(2020, 6, 1))
    assert(typed.getLong(1) == 42L)

    // DESCRIBE surfaces the defaults; changelog/metadata docs re-parse
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val since = meta.currentSchema.fields.find(_.name == "since").get
    assert(since.initialDefault.contains("\"2020-06-01\""), since.toString)
  }
}
