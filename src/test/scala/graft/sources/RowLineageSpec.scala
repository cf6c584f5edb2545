package graft.sources

import graft.SparkSpec
import graft.iceberg._

/** Iceberg v3 ROW LINEAGE: `_row_id` / `_last_updated_sequence_number`
  * as metadata columns. The invariants pinned here:
  *   - appends claim contiguous per-file id blocks from `next-row-id`
  *     (manifest field 142), ids unique for the table's lifetime;
  *   - DELETE (deletion vectors) never moves rows — survivors keep ids;
  *   - MOR UPDATE preserves the updated row's identity (the delta
  *     writer materializes the original _row_id into the carry file)
  *     and bumps _last_updated_sequence_number to the update's commit;
  *   - compaction rewrites preserve ids by materializing them;
  *   - upgrading a v2 table with data BACKFILLS ids for every live file
  *     in one metadata-only commit;
  *   - an equality upsert is delete + insert — identity changes, by the
  *     spec's own model. */
class RowLineageSpec extends SparkSpec {

  private def freshCatalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-$name").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  test("appends assign contiguous blocks; DV deletes keep survivor ids") {
    val wh = freshCatalog("rl1")
    spark.sql("CREATE TABLE rl1.db.t (k BIGINT, v STRING) TBLPROPERTIES (" +
      "'format-version'='3', 'commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO rl1.db.t " +
      "SELECT /*+ REPARTITION(1) */ id, concat('v', id) FROM range(0, 20)")
    spark.sql("INSERT INTO rl1.db.t " +
      "SELECT /*+ REPARTITION(1) */ id, concat('v', id) FROM range(20, 30)")
    val dir = s"$wh/db/t"
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    assert(meta.nextRowId.contains(30L), s"next-row-id: ${meta.nextRowId}")
    val rows = spark.sql(
      "SELECT k, _row_id, _last_updated_sequence_number FROM rl1.db.t ORDER BY _row_id")
      .collect()
    assert(rows.length == 30)
    assert(rows.map(_.getLong(1)).toSeq == (0L until 30L), "ids contiguous, unique")
    // the two commits carry distinct sequences; each file's rows share one
    val lusBy = rows.groupBy(_.getLong(2)).view.mapValues(_.length).toMap
    assert(lusBy.values.toSeq.sorted == Seq(10, 20), lusBy.toString)

    // DV DELETE: survivors keep their EXACT ids (rows never move)
    val before = spark.sql("SELECT k, _row_id FROM rl1.db.t WHERE k >= 5")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.sql("DELETE FROM rl1.db.t WHERE k < 5")
    val after = spark.sql("SELECT k, _row_id FROM rl1.db.t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before, "DV delete must not disturb surviving ids")
    // and no id is ever reused
    val meta2 = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    assert(meta2.nextRowId.contains(30L))
  }

  test("MOR UPDATE preserves identity and bumps the last-updated sequence") {
    val wh = freshCatalog("rl2")
    spark.sql("CREATE TABLE rl2.db.t (k BIGINT, v STRING) TBLPROPERTIES (" +
      "'format-version'='3', 'write.update.mode'='merge-on-read', " +
      "'commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO rl2.db.t " +
      "SELECT /*+ REPARTITION(1) */ id, concat('v', id) FROM range(0, 20)")
    val dir = s"$wh/db/t"
    val before = spark.sql("SELECT k, _row_id, _last_updated_sequence_number " +
      "FROM rl2.db.t").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.sql("UPDATE rl2.db.t SET v = 'updated' WHERE k % 5 = 0")
    val after = spark.sql("SELECT k, v, _row_id, _last_updated_sequence_number " +
      "FROM rl2.db.t").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(after.size == 20)
    val newSeq = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
      .currentSnapshotId.get
    for ((k, (v, rid, lus)) <- after) {
      assert(rid == before(k)._1, s"k=$k changed identity: $rid vs ${before(k)._1}")
      if (k % 5 == 0) {
        assert(v == "updated")
        assert(lus > before(k)._2 && lus == newSeq,
          s"k=$k lus must bump to the update commit: $lus")
      } else assert(lus == before(k)._2, s"k=$k untouched row's lus moved")
    }
  }

  test("compaction preserves ids by materializing them; upsert renews identity") {
    val wh = freshCatalog("rl3")
    spark.sql("CREATE TABLE rl3.db.t (k BIGINT, v STRING) TBLPROPERTIES (" +
      "'format-version'='3', 'commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO rl3.db.t " +
      "SELECT /*+ REPARTITION(1) */ id, concat('v', id) FROM range(0, 15)")
    spark.sql("INSERT INTO rl3.db.t " +
      "SELECT /*+ REPARTITION(1) */ id, concat('v', id) FROM range(15, 30)")
    spark.sql("DELETE FROM rl3.db.t WHERE k IN (3, 17)")
    val dir = s"$wh/db/t"
    val before = spark.sql("SELECT k, _row_id FROM rl3.db.t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.sql("CALL rl3.system.rewrite_data_files(table => 'db.t')")
    val after = spark.sql("SELECT k, _row_id FROM rl3.db.t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before, "compaction must carry row ids through")
    // the compacted file materializes lineage; its entry claims no block
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val dataE = meta.currentSnapshot.toSeq
      .flatMap(s => ManifestListReader.read(s.manifestList.get))
      .filter(_.content == 0).flatMap(i => ManifestWriter.read(i.path))
      .filter(e => e.status != 2 && e.content == 0)
    assert(dataE.forall(_.firstRowId.isEmpty),
      "materialized-lineage files must not claim id blocks")
    assert(meta.nextRowId.contains(30L), meta.nextRowId.toString)

    // upsert: delete + insert — the new row VERSION is a new row
    GraftTable.upsert(spark,
      dir, spark.sql("SELECT CAST(5 AS BIGINT) AS k, 'up' AS v"), Seq("k"))
    val up = spark.sql("SELECT _row_id FROM rl3.db.t WHERE k = 5").head().getLong(0)
    assert(up >= 30L, s"upserted row must get a fresh id, got $up")
  }

  test("MOR UPDATE carries lineage on a hidden-partitioned table") {
    val wh = freshCatalog("rl6")
    spark.sql("CREATE TABLE rl6.db.t (k BIGINT, r BIGINT, v STRING) " +
      "PARTITIONED BY (r) TBLPROPERTIES (" +
      "'format-version'='3', 'write.update.mode'='merge-on-read', " +
      "'commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO rl6.db.t SELECT id, id % 3, concat('v', id) " +
      "FROM range(0, 30)")
    val before = spark.sql("SELECT k, _row_id FROM rl6.db.t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hits every partition; carry files split per partition tuple
    spark.sql("UPDATE rl6.db.t SET v = 'u' WHERE k % 4 = 0")
    val after = spark.sql("SELECT k, v, _row_id FROM rl6.db.t")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(after.size == 30)
    after.foreach { case (k, (v, rid)) =>
      assert(rid == before(k), s"k=$k identity changed")
      assert(v == (if (k % 4 == 0) "u" else s"v$k"))
    }
    // partition pruning still works over the carry files
    assert(spark.sql("SELECT count(*) FROM rl6.db.t WHERE r = 1")
      .head().getLong(0) == 10L)
  }

  test("zero-copy fork of a v3 table inherits lineage whole") {
    val wh = freshCatalog("rl5")
    spark.sql("CREATE TABLE rl5.db.src (k BIGINT, v STRING) TBLPROPERTIES (" +
      "'format-version'='3', 'commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO rl5.db.src " +
      "SELECT /*+ REPARTITION(1) */ id, concat('v', id) FROM range(0, 12)")
    // a compaction so the source carries a MATERIALIZED-lineage file
    spark.sql("CALL rl5.system.rewrite_data_files(table => 'db.src')")
    spark.sql("INSERT INTO rl5.db.src " +
      "SELECT /*+ REPARTITION(1) */ id, concat('v', id) FROM range(12, 20)")
    val srcIds = spark.sql("SELECT k, _row_id FROM rl5.db.src")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.sql("CALL rl5.system.snapshot(source_table => 'db.src', table => 'db.fork')")
    val forkDir = s"$wh/db/fork"
    val forkMeta = TableMetadata.parseFile(GraftTable.latestMetadataPath(forkDir))
    assert(forkMeta.formatVersion == 3, "fork must stay v3")
    assert(forkMeta.nextRowId ==
      TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/src")).nextRowId,
      "fork inherits the id counter")
    val forkIds = spark.sql("SELECT k, _row_id FROM rl5.db.fork")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(forkIds == srcIds, "fork rows keep the source's exact ids")
    // fork appends continue ABOVE the inherited range — never colliding
    spark.sql("INSERT INTO rl5.db.fork SELECT 100, 'x'")
    val all = spark.sql("SELECT _row_id FROM rl5.db.fork")
      .collect().map(_.getLong(0)).toSeq
    assert(all.distinct.length == all.length, s"duplicate ids: $all")
  }

  test("racing v3 appends claim disjoint id blocks through the CAS loop") {
    val wh = freshCatalog("rl7")
    spark.sql("CREATE TABLE rl7.db.t (k BIGINT) TBLPROPERTIES (" +
      "'format-version'='3', 'commit-timestamp-ms'='1700000000000')")
    val dir = s"$wh/db/t"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // four concurrent appends of 10 rows each: the CAS loop serializes
    // the commits and assignRowIds re-runs per retry against the fresh
    // base — every block must be disjoint, the counter exact
    val futures = (0 until 4).map { i =>
      Future {
        GraftTable.append(spark, dir,
          spark.range(i * 10, i * 10 + 10).toDF("k"))
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    val ids = spark.sql("SELECT _row_id FROM rl7.db.t")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.length == 40 && ids.distinct.length == 40,
      s"overlapping id blocks: ${ids.sorted.take(50)}")
    assert(ids.toSet == (0L until 40L).toSet, ids.sorted.toString)
    assert(TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
      .nextRowId.contains(40L))
  }

  test("v2 upgrade backfills ids for existing files; sort rewrite also carries") {
    val wh = freshCatalog("rl4")
    spark.sql("CREATE TABLE rl4.db.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO rl4.db.t " +
      "SELECT /*+ REPARTITION(1) */ id, concat('v', id) FROM range(0, 25)")
    val dir = s"$wh/db/t"
    // pre-upgrade: no lineage
    assert(spark.sql("SELECT count(_row_id) FROM rl4.db.t").head().getLong(0) == 0L)
    spark.sql("ALTER TABLE rl4.db.t SET TBLPROPERTIES ('format-version'='3')")
    val ids = spark.sql("SELECT _row_id FROM rl4.db.t ORDER BY _row_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == (0L until 25L), s"backfill must assign all live rows: $ids")
    assert(TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
      .nextRowId.contains(25L))
    // a SORTED rewrite (different write path than binpack) also carries
    val before = spark.sql("SELECT k, _row_id FROM rl4.db.t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.sql("CALL rl4.system.rewrite_data_files(table => 'db.t', " +
      "strategy => 'sort', sort_order => 'k DESC')")
    val after = spark.sql("SELECT k, _row_id FROM rl4.db.t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before, "sorted rewrite must carry row ids through")
  }
}
