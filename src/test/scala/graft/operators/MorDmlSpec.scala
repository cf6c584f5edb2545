package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.iceberg._

/** SQL UPDATE / DELETE / MERGE in MERGE-ON-READ mode (`write.<op>.mode =
  * merge-on-read` table properties): the delta route lands position
  * deletes + new rows in one snapshot WITHOUT rewriting untouched data —
  * every spec here asserts both the answer AND that the pre-existing
  * data files survived verbatim (the O(changed-rows) contract the mode
  * exists for). */
class MorDmlSpec extends SparkSpec {

  private def freshCatalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-$name").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  private def dataFiles(wh: String, table: String): Seq[String] = {
    val meta = TableMetadata.parseFile(
      GraftTable.latestMetadataPath(s"$wh/db/$table"))
    meta.currentSnapshot.toSeq
      .flatMap(s => ManifestListReader.read(s.manifestList.get))
      .filter(_.content == 0)
      .flatMap(i => ManifestWriter.read(i.path))
      .filter(e => e.status != 2 && e.content == 0).map(_.filePath).sorted
  }

  private def deleteFiles(wh: String, table: String): Seq[String] = {
    val meta = TableMetadata.parseFile(
      GraftTable.latestMetadataPath(s"$wh/db/$table"))
    meta.currentSnapshot.toSeq
      .flatMap(s => ManifestListReader.read(s.manifestList.get))
      .filter(_.content == 1)
      .flatMap(i => ManifestWriter.read(i.path))
      .filter(_.status != 2).map(_.filePath)
  }

  private val morProps =
    "TBLPROPERTIES ('write.update.mode'='merge-on-read', " +
      "'write.delete.mode'='merge-on-read', " +
      "'write.merge.mode'='merge-on-read', " +
      "'commit-timestamp-ms'='1700000000000')"

  test("MOR UPDATE lands position deletes + new rows; untouched files survive") {
    val wh = freshCatalog("mor1")
    spark.sql(s"CREATE TABLE mor1.db.t (k BIGINT, v STRING) $morProps")
    spark.sql("INSERT INTO mor1.db.t SELECT id, concat('v', id) FROM range(0, 50)")
    spark.sql("INSERT INTO mor1.db.t SELECT id, concat('v', id) FROM range(50, 100)")
    val before = dataFiles(wh, "t")
    spark.sql("UPDATE mor1.db.t SET v = 'updated' WHERE k % 10 = 0")
    // the answer
    val got = spark.sql("SELECT k FROM mor1.db.t WHERE v = 'updated' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == (0L until 100L by 10).toSeq)
    assert(spark.sql("SELECT count(*) FROM mor1.db.t").head().getLong(0) == 100L)
    // the contract: every pre-update data file is STILL LISTED (no
    // rewrite), the updated rows live in new file(s), deletes are files
    val after = dataFiles(wh, "t")
    assert(before.forall(after.contains), "untouched data files were rewritten")
    assert(after.size > before.size, "updated rows must land in new files")
    assert(deleteFiles(wh, "t").nonEmpty, "no position-delete file committed")
    // cross-route: the native read agrees — INCLUDING old-row absence
    // (110 here would mean the deltas' deletes never applied natively)
    val native = GraftTable.read(spark, GraftTable.latestMetadataPath(s"$wh/db/t"))
    assert(native.count() == 100L)
    assert(native.filter(col("v") === "updated").count() == 10L)
    assert(native.filter(col("k") === 0 && col("v") === "v0").count() == 0L)
  }

  test("MOR DELETE (subquery predicate, row-level plan); data files untouched") {
    val wh = freshCatalog("mor2")
    spark.sql(s"CREATE TABLE mor2.db.t (k BIGINT, v STRING) $morProps")
    spark.sql("INSERT INTO mor2.db.t SELECT id, concat('v', id) FROM range(0, 100)")
    val before = dataFiles(wh, "t")
    spark.sql(
      "DELETE FROM mor2.db.t WHERE k IN (SELECT id * 7 FROM range(0, 5))")
    assert(spark.sql("SELECT count(*) FROM mor2.db.t").head().getLong(0) == 95L)
    assert(spark.sql("SELECT count(*) FROM mor2.db.t WHERE k = 14").head().getLong(0) == 0L)
    val after = dataFiles(wh, "t")
    assert(after == before, s"row-level DELETE must not touch data files: $before vs $after")
    assert(deleteFiles(wh, "t").nonEmpty)
  }

  test("MOR MERGE INTO: matched rows update in place, unmatched insert") {
    val wh = freshCatalog("mor3")
    spark.sql(s"CREATE TABLE mor3.db.t (k BIGINT, v STRING) $morProps")
    spark.sql("INSERT INTO mor3.db.t SELECT id, concat('v', id) FROM range(0, 20)")
    val before = dataFiles(wh, "t")
    spark.sql(
      """MERGE INTO mor3.db.t AS t
        |USING (SELECT id * 5 AS k, concat('m', id) AS v FROM range(0, 6)) AS s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    // keys 0,5,10,15 matched (m0,m1,m2,m3); 20,25 inserted (m4,m5)
    val rows = spark.sql("SELECT k, v FROM mor3.db.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == 22)
    assert(rows.filter(_._2.startsWith("m")).map(_._1).toSeq ==
      Seq(0L, 5L, 10L, 15L, 20L, 25L))
    val after = dataFiles(wh, "t")
    assert(before.forall(after.contains), "MERGE must not rewrite untouched files")
    assert(deleteFiles(wh, "t").nonEmpty)
  }

  test("MOR UPDATE on a hidden-partitioned table: per-tuple files, pruning intact") {
    val wh = freshCatalog("mor5")
    spark.sql("CREATE TABLE mor5.db.t (k BIGINT, r INT, v STRING) " +
      "PARTITIONED BY (r) " + morProps)
    spark.sql(
      "INSERT INTO mor5.db.t SELECT id, CAST(id % 4 AS INT), concat('v', id) FROM range(0, 80)")
    val before = dataFiles(wh, "t")
    spark.sql("UPDATE mor5.db.t SET v = 'u' WHERE k < 8")
    assert(spark.sql("SELECT count(*) FROM mor5.db.t").head().getLong(0) == 80L)
    assert(spark.sql("SELECT count(*) FROM mor5.db.t WHERE v = 'u'")
      .head().getLong(0) == 8L)
    val after = dataFiles(wh, "t")
    assert(before.forall(after.contains), "untouched partitioned files rewritten")
    // the re-inserted rows landed as per-tuple files with field-507
    // summaries — the identity-partition prune still answers per region
    assert(spark.sql("SELECT count(*) FROM mor5.db.t WHERE r = 2 AND v = 'u'")
      .head().getLong(0) == 2L) // keys 2 and 6
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/t"))
    val newDataManifests = meta.currentSnapshot.toSeq
      .flatMap(s => ManifestListReader.read(s.manifestList.get))
      .filter(i => i.content == 0 && i.path.contains("m-delta-data"))
    assert(newDataManifests.nonEmpty && newDataManifests.forall(_.summaries.isDefined),
      "delta data files on a partitioned table must carry prunable summaries")
  }

  test("MOR deletes compose with later maintenance: compact materializes them away") {
    val wh = freshCatalog("mor4")
    spark.sql(s"CREATE TABLE mor4.db.t (k BIGINT, v STRING) $morProps")
    spark.sql("INSERT INTO mor4.db.t SELECT id, concat('v', id) FROM range(0, 30)")
    spark.sql("UPDATE mor4.db.t SET v = 'u' WHERE k < 3")
    GraftTable.compact(spark, s"$wh/db/t", targetBytes = 1L << 30)
    assert(deleteFiles(wh, "t").isEmpty, "compaction must drop delete manifests")
    assert(spark.sql("SELECT count(*) FROM mor4.db.t").head().getLong(0) == 30L)
    assert(spark.sql("SELECT count(*) FROM mor4.db.t WHERE v = 'u'")
      .head().getLong(0) == 3L)
  }
}
