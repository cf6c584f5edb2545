package graft.iceberg

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Changelog compute-updates semantics: pairing, carry-over removal,
  * and the cases that must NOT pair. */
class ChangelogUpdatesSpec extends SparkSpec {

  private def setup(tag: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
    spark.conf.set(s"spark.sql.catalog.$tag",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.warehouse", wh)
    wh
  }

  test("MOR update pairs; plain inserts/deletes stay; carry-overs drop") {
    val wh = setup("clu")
    spark.sql("CREATE TABLE clu.db.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.update.mode'='merge-on-read', " +
      "'commit-timestamp-ms'='1700000000000')")
    // ordinal 0: 10 inserts; ordinal 1: MOR update of k<3;
    // ordinal 2: plain delete of k=9
    spark.sql("INSERT INTO clu.db.t SELECT id, concat('v', id) FROM range(0, 10)")
    spark.sql("UPDATE clu.db.t SET v = concat(v, '_u') WHERE k < 3")
    spark.sql("DELETE FROM clu.db.t WHERE k = 9")
    spark.sql("CALL clu.system.create_changelog_view(table => 'db.t', " +
      "changelog_view => 'clu_changes', identifier_columns => 'k')")
    val rows = spark.sql("""SELECT _change_ordinal, _change_type, count(*)
      FROM clu_changes GROUP BY 1, 2 ORDER BY 1, 2""").collect().toSeq
    assert(rows == Seq(
      Row(0, "insert", 10L),
      Row(1, "update_after", 3L), Row(1, "update_before", 3L),
      Row(2, "delete", 1L)), rows.toString)
    // the pre/post images carry the actual old and new values
    val img = spark.sql("""SELECT _change_type, v FROM clu_changes
      WHERE k = 1 AND _change_ordinal = 1 ORDER BY _change_type""").collect().toSeq
    assert(img == Seq(Row("update_after", "v1_u"), Row("update_before", "v1")))
    // without identifier_columns the same range stays raw insert/delete
    spark.sql("CALL clu.system.create_changelog_view(table => 'db.t', " +
      "changelog_view => 'clu_raw')")
    assert(spark.sql(
      "SELECT count(*) FROM clu_raw WHERE _change_type LIKE 'update%'")
      .head() == Row(0L))
  }

  test("COW update: carry-over rows vanish, changed rows pair") {
    val wh = setup("clc")
    spark.sql("CREATE TABLE clc.db.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    // ONE file of 20 rows, then a COW update of 4 of them: the rewrite
    // tombstones the whole file, so 16 untouched rows emit identical
    // delete+insert pairs — compute-updates must drop every one
    spark.sql("INSERT INTO clc.db.t " +
      "SELECT id, concat('v', id) FROM range(0, 20) ORDER BY id")
    spark.sql("UPDATE clc.db.t SET v = 'changed' WHERE k % 5 = 0")
    spark.sql("CALL clc.system.create_changelog_view(table => 'db.t', " +
      "changelog_view => 'clc_changes', identifier_columns => 'k')")
    val rows = spark.sql("""SELECT _change_type, count(*), sum(k)
      FROM clc_changes WHERE _change_ordinal = 1
      GROUP BY 1 ORDER BY 1""").collect().toSeq
    assert(rows == Seq(
      Row("update_after", 4L, 30L), Row("update_before", 4L, 30L)), rows.toString)
    // the raw changelog DOES carry the co-located rows — the drop is
    // compute-updates' doing, not an accident of the fixture
    spark.sql("CALL clc.system.create_changelog_view(table => 'db.t', " +
      "changelog_view => 'clc_raw')")
    assert(spark.sql(
      "SELECT count(*) FROM clc_raw WHERE _change_ordinal = 1").head()
      .getLong(0) > 8L)
  }

  test("unknown identifier column refuses") {
    val wh = setup("cle")
    spark.sql("CREATE TABLE cle.db.t (k BIGINT) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO cle.db.t SELECT id FROM range(0, 3)")
    val e = intercept[Exception](spark.sql(
      "CALL cle.system.create_changelog_view(table => 'db.t', " +
        "changelog_view => 'cle_x', identifier_columns => 'nope')"))
    assert(e.getMessage.contains("identifier column"), e.getMessage)
    // '' must refuse too — silently degrading to the raw changelog
    // would hand a pairing-expectant consumer unpaired rows
    val e2 = intercept[Exception](spark.sql(
      "CALL cle.system.create_changelog_view(table => 'db.t', " +
        "changelog_view => 'cle_x', identifier_columns => '')"))
    assert(e2.getMessage.contains("at least one"), e2.getMessage)
  }
}
