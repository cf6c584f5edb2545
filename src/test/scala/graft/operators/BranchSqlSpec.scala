package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.iceberg._

/** Write-audit-publish drivable PURELY from SQL: create_branch procedure,
  * branch-suffixed INSERT target (`t.branch_audit`), `VERSION AS OF
  * '<ref>'` string resolution (tags AND branches), fast_forward publish.
  * Plus the path-route `option("branch", ...)` writer. */
class BranchSqlSpec extends SparkSpec {

  test("SQL WAP lifecycle: stage on branch, audit, publish") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wap-sql").toString
    spark.conf.set("spark.sql.catalog.wap_sql",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wap_sql.warehouse", wh)
    spark.sql("CREATE TABLE wap_sql.db.t (k INT, v STRING)")
    spark.sql("INSERT INTO wap_sql.db.t VALUES (1, 'main-1'), (2, 'main-2')")
    // a typo'd branch suffix must not silently fork a lineage
    intercept[Exception] {
      spark.sql("INSERT INTO wap_sql.db.t.branch_audit VALUES (9, 'x')")
    }
    val br = spark.sql(
      "CALL wap_sql.system.create_branch(table => 'db.t', branch => 'audit')").head()
    assert(br.getString(0) == "audit")
    // stage: the branch-suffixed identifier routes the append to the ref
    spark.sql("INSERT INTO wap_sql.db.t.branch_audit VALUES (3, 'staged-3')")
    // audit: main untouched, branch sees staged rows — via BOTH surfaces
    assert(spark.sql("SELECT COUNT(*) FROM wap_sql.db.t").head().getLong(0) == 2L)
    assert(spark.sql("SELECT COUNT(*) FROM wap_sql.db.t.branch_audit")
      .head().getLong(0) == 3L)
    assert(spark.sql("SELECT COUNT(*) FROM wap_sql.db.t VERSION AS OF 'audit'")
      .head().getLong(0) == 3L)
    // a second staged append chains on the BRANCH head, not main's
    spark.sql("INSERT INTO wap_sql.db.t.branch_audit VALUES (4, 'staged-4')")
    assert(spark.sql("SELECT COUNT(*) FROM wap_sql.db.t VERSION AS OF 'audit'")
      .head().getLong(0) == 4L)
    assert(spark.sql("SELECT COUNT(*) FROM wap_sql.db.t").head().getLong(0) == 2L)
    // publish: fast-forward main onto the audited head
    spark.sql("CALL wap_sql.system.fast_forward('db.t', 'audit')")
    val live = spark.sql("SELECT k, v FROM wap_sql.db.t ORDER BY k").collect()
    assert(live.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(live.last.getString(1) == "staged-4")
  }

  test("VERSION AS OF resolves tags by name; numeric stays a snapshot id") {
    val wh = java.nio.file.Files.createTempDirectory("graft-tagver").toString
    spark.conf.set("spark.sql.catalog.tag_sql",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tag_sql.warehouse", wh)
    spark.sql("CREATE TABLE tag_sql.db.t (k INT)")
    spark.sql("INSERT INTO tag_sql.db.t VALUES (1)")
    spark.sql("CALL tag_sql.system.create_tag('db.t', 'v1')")
    spark.sql("INSERT INTO tag_sql.db.t VALUES (2)")
    assert(spark.sql("SELECT COUNT(*) FROM tag_sql.db.t").head().getLong(0) == 2L)
    assert(spark.sql("SELECT COUNT(*) FROM tag_sql.db.t VERSION AS OF 'v1'")
      .head().getLong(0) == 1L)
    assert(spark.sql("SELECT COUNT(*) FROM tag_sql.db.t VERSION AS OF 1")
      .head().getLong(0) == 1L)
    // tag-suffixed identifier: reads pin the tagged snapshot...
    assert(spark.sql("SELECT COUNT(*) FROM tag_sql.db.t.tag_v1")
      .head().getLong(0) == 1L)
    // ...writes refuse loudly (a tag is immutable; silently landing the
    // commit on main would be worse than an error)
    val e = intercept[Exception](
      spark.sql("INSERT INTO tag_sql.db.t.tag_v1 VALUES (9)"))
    assert(e.getMessage.contains("TAG"), e.getMessage)
    intercept[Exception](
      spark.sql("DELETE FROM tag_sql.db.t.tag_v1 WHERE k = 1"))
    assert(spark.sql("SELECT COUNT(*) FROM tag_sql.db.t").head().getLong(0) == 2L)
    // a typo'd tag must not resolve
    intercept[Exception](
      spark.sql("SELECT COUNT(*) FROM tag_sql.db.t.tag_nope").collect())
    // the tag-suffix route resolves the TAGGED snapshot's schema — same
    // rule as VERSION AS OF: after a rename, the archival point still
    // shows the column name that existed then
    spark.sql("ALTER TABLE tag_sql.db.t RENAME COLUMN k TO kk")
    assert(spark.table("tag_sql.db.t.tag_v1").schema.fieldNames.toSeq == Seq("k"),
      "tag reads must project the snapshot's schema")
    assert(spark.sql("SELECT k FROM tag_sql.db.t.tag_v1").head().getInt(0) == 1)
    assert(spark.table("tag_sql.db.t").schema.fieldNames.toSeq == Seq("kk"))
  }

  test("path-route branch write option stages without moving main") {
    val dir = java.nio.file.Files.createTempDirectory("graft-branch-opt").toString
    GraftTable.create(dir, IcebergSchema(0, Seq(
      IcebergField(1, "k", required = false, "int"))),
      tableUuid = java.util.UUID.randomUUID().toString, timestampMs = 1700000000000L)
    import spark.implicits._
    GraftTable.append(spark, dir, Seq(1, 2).toDF("k"))
    Seq(3).toDF("k").write.format("graft-table")
      .option("metadata", GraftTable.latestMetadataPath(dir))
      .option("branch", "exp").mode("append").save()
    val metaPath = GraftTable.latestMetadataPath(dir)
    assert(GraftTable.read(spark, metaPath).count() == 2L)
    assert(GraftTable.read(spark, metaPath, ref = Some("exp")).count() == 3L)
    val meta = TableMetadata.parseFile(metaPath)
    assert(meta.refs.exists(r => r.name == "exp" && r.refType == "branch"))
  }
}
