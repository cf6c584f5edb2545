package graft.sources

import org.apache.spark.sql.Row

import graft.SparkSpec

/** `register_table`: catalog adoption by pointer — validation, shared
  * state through both identifiers, and the drop/rename contracts that
  * distinguish a registered entry from an owned table. */
class RegisterTableSpec extends SparkSpec {

  private def mkCatalog(name: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  test("register, operate through both identifiers, drop keeps the table") {
    val root = java.nio.file.Files.createTempDirectory("graft-reg").toString
    mkCatalog("rga", s"$root/a")
    mkCatalog("rgb", s"$root/b")
    spark.sql("CREATE TABLE rga.db.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO rga.db.t SELECT id, concat('v', id) FROM range(0, 50)")
    val metaFile = graft.iceberg.GraftTable.latestMetadataPath(s"$root/a/db/t")

    val row = spark.sql("CALL rgb.system.register_table(table => 'db.r', " +
      s"metadata_file => '$metaFile')").head()
    assert(row.getString(0) == s"$root/a/db/t")
    assert(spark.sql("SELECT count(*), sum(k) FROM rgb.db.r").head() ==
      Row(50L, 1225L))

    // DML through the registered identifier commits in the ORIGINAL dir
    spark.sql("INSERT INTO rgb.db.r SELECT id, concat('w', id) FROM range(100, 110)")
    assert(spark.sql("SELECT count(*) FROM rga.db.t").head() == Row(60L))
    // a delete through the SOURCE identifier is seen by the registered one
    spark.sql("DELETE FROM rga.db.t WHERE k >= 100")
    assert(spark.sql("SELECT count(*) FROM rgb.db.r").head() == Row(50L))
    // metadata tables and procedures resolve through the pointer
    assert(spark.sql("SELECT count(*) FROM rgb.db.r.snapshots").head()
      .getLong(0) >= 3L)

    // DROP removes only the pointer: the adopted table survives intact
    spark.sql("DROP TABLE rgb.db.r")
    assert(!new java.io.File(s"$root/b/db/r").exists())
    assert(spark.sql("SELECT count(*) FROM rga.db.t").head() == Row(50L))
    intercept[Exception](spark.sql("SELECT count(*) FROM rgb.db.r").collect())
  }

  test("rename moves only the pointer; validation refuses bad registrations") {
    val root = java.nio.file.Files.createTempDirectory("graft-reg2").toString
    mkCatalog("rgc", s"$root/a")
    mkCatalog("rgd", s"$root/b")
    spark.sql("CREATE TABLE rgc.db.t (k BIGINT) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO rgc.db.t SELECT id FROM range(0, 5)")
    val dir = s"$root/a/db/t"
    val metaFile = graft.iceberg.GraftTable.latestMetadataPath(dir)

    // a superseded (non-current) metadata version refuses
    val stale = graft.iceberg.OptimisticCommit.metadataPath(dir, 1)
    val e1 = intercept[Exception](spark.sql(
      s"CALL rgd.system.register_table(table => 'db.r', metadata_file => '$stale')"))
    assert(e1.getMessage.contains("current"), e1.getMessage)
    // a non-table path refuses
    intercept[Exception](spark.sql("CALL rgd.system.register_table(" +
      s"table => 'db.r', metadata_file => '$root/nowhere/v1.metadata.json')"))

    spark.sql(s"CALL rgd.system.register_table(table => 'db.r', " +
      s"metadata_file => '$metaFile')")
    // an occupied identifier refuses a second registration
    val e2 = intercept[Exception](spark.sql("CALL rgd.system.register_table(" +
      s"table => 'db.r', metadata_file => '$metaFile')"))
    assert(e2.getMessage.contains("already exists"), e2.getMessage)

    // RENAME moves the pointer file; the adopted directory is untouched
    spark.sql("ALTER TABLE rgd.db.r RENAME TO db.r2")
    assert(spark.sql("SELECT count(*) FROM rgd.db.r2").head() == Row(5L))
    assert(new java.io.File(s"$dir/v1.metadata.json").exists(),
      "rename of a registered entry must not move the adopted table")
    assert(spark.sql("SELECT count(*) FROM rgc.db.t").head() == Row(5L))
  }

  test("a stale pointer blocks CREATE at the identifier until dropped") {
    val root = java.nio.file.Files.createTempDirectory("graft-reg3").toString
    mkCatalog("rge", s"$root/a")
    mkCatalog("rgf", s"$root/b")
    spark.sql("CREATE TABLE rge.db.t (k BIGINT) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO rge.db.t SELECT id FROM range(0, 3)")
    spark.sql("CALL rgf.system.register_table(table => 'db.r', metadata_file " +
      s"=> '${graft.iceberg.GraftTable.latestMetadataPath(s"$root/a/db/t")}')")
    // the adopted table vanishes out from under the pointer (dropped
    // through its OWNING catalog — shared-ownership hazard by design)
    spark.sql("DROP TABLE rge.db.t")
    // CREATE at the dangling identifier must refuse (the identifier is
    // occupied), not materialize a fresh table inside the dead target
    // directory — Spark's own exists-check fires off our tableExists
    val e = intercept[Exception](spark.sql("CREATE TABLE rgf.db.r (x BIGINT)"))
    assert(e.getMessage.contains("already exists"), e.getMessage)
    assert(!new java.io.File(s"$root/a/db/t/v1.metadata.json").exists(),
      "nothing may be created inside the dead target")
    // DROP clears the stale pointer; the identifier is reusable after
    spark.sql("DROP TABLE rgf.db.r")
    spark.sql("CREATE TABLE rgf.db.r (x BIGINT) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO rgf.db.r VALUES (1)")
    assert(spark.sql("SELECT count(*) FROM rgf.db.r").head() == Row(1L))
  }
}
