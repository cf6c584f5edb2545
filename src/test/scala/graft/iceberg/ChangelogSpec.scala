package graft.iceberg

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The CDC changelog contract: replaying the changelog — per ordinal,
  * add the inserts and remove the deletes — reproduces every snapshot
  * state on the consumed ancestry. Covers appends, MOR position-delete
  * DML, equality-delete upserts, COW overwrites (tombstoned files emit
  * delete+insert pairs), and `replace` invisibility (compaction emits
  * nothing). */
class ChangelogSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.select("k", "name", "r").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("changelog replay reproduces every snapshot state; replace emits nothing") {
    val wh = java.nio.file.Files.createTempDirectory("graft-changelog").toString
    spark.conf.set("spark.sql.catalog.gcl", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcl.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("gcl_nation")
    spark.sql("CREATE TABLE gcl.db.t (k BIGINT, name STRING, r BIGINT)")
    // s1, s2: two appends
    spark.sql("""INSERT INTO gcl.db.t
      SELECT n_nationkey, n_name, n_regionkey FROM gcl_nation WHERE n_nationkey < 10""")
    spark.sql("""INSERT INTO gcl.db.t
      SELECT n_nationkey, n_name, n_regionkey FROM gcl_nation WHERE n_nationkey >= 10""")
    // s3: MOR position-delete DML
    spark.sql("DELETE FROM gcl.db.t WHERE k = 2 OR k = 12")
    // s4: equality-delete upsert (update k=5, insert k=100)
    val dir = s"$wh/db/t"
    import spark.implicits._
    GraftTable.upsert(spark, dir,
      Seq((5L, "UPSERTED", 9L), (100L, "NEW ROW", 9L)).toDF("k", "name", "r"),
      Seq("k"))
    // s5: COW overwrite (UPDATE rewrites the files containing k=7)
    spark.sql("UPDATE gcl.db.t SET name = 'REWRITTEN' WHERE k = 7")
    // s6: compaction — a replace snapshot, logically invisible
    spark.sql("CALL gcl.system.rewrite_data_files(table => 'db.t')")

    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val chain = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Snapshot]
      var cur = meta.currentSnapshot
      while (cur.isDefined) { b += cur.get; cur = cur.get.parentSnapshotId.flatMap(meta.snapshot) }
      b.reverse.toSeq
    }
    assert(chain.size == 6)
    assert(chain.last.operation.contains("replace"))

    val log = GraftTable.changelog(spark, dir).cache()
    try {
      // the replace snapshot contributes nothing
      assert(log.filter(col("_commit_snapshot_id") === chain.last.snapshotId).count() == 0)
      // ordinals are the chain positions of the emitting snapshots
      val byOrdinal = log.select("_change_ordinal", "_commit_snapshot_id").distinct()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      byOrdinal.foreach { case (o, sid) => assert(chain(o).snapshotId == sid) }

      // replay: state after ordinal k == the table read at that snapshot
      var state = Set.empty[(Long, String, Long)]
      chain.zipWithIndex.foreach { case (s, o) =>
        val ins = rowsOf(log.filter(col("_change_ordinal") === o &&
          col("_change_type") === "insert"))
        val del = rowsOf(log.filter(col("_change_ordinal") === o &&
          col("_change_type") === "delete"))
        assert((del -- state).isEmpty,
          s"ordinal $o deletes rows that were not visible: ${del -- state}")
        state = state -- del ++ ins
        val snapState = rowsOf(GraftTable.read(spark,
          GraftTable.latestMetadataPath(dir), snapshotId = Some(s.snapshotId)))
        assert(state == snapState, s"replay diverged at ordinal $o (${s.operation})")
      }
      // the COW overwrite really emitted via tombstones: its ordinal has
      // BOTH deletes and inserts, and the updated row appears post-image
      val cowOrd = chain.indexWhere(_.operation.contains("overwrite")) // first overwrite = upsert? guard below
      val updOrd = chain.zipWithIndex.collect {
        case (s, i) if s.operation.contains("overwrite") => i }.last
      assert(cowOrd >= 0 && updOrd >= 0)
      val updIns = rowsOf(log.filter(col("_change_ordinal") === updOrd &&
        col("_change_type") === "insert"))
      assert(updIns.exists(t => t._1 == 7L && t._2 == "REWRITTEN"))
    } finally log.unpersist()

    // range scoping: (s2, s4] covers exactly s3 and s4, re-based ordinals
    val ranged = GraftTable.changelog(spark, dir,
      startSnapshotId = Some(chain(1).snapshotId),
      endSnapshotId = Some(chain(3).snapshotId))
    val ids = ranged.select("_commit_snapshot_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(chain(2).snapshotId, chain(3).snapshotId))
    assert(ranged.select(max("_change_ordinal")).head.getInt(0) == 1)
    // the MOR delete commit emits exactly its two deleted rows
    val delRows = rowsOf(ranged.filter(col("_commit_snapshot_id") === chain(2).snapshotId &&
      col("_change_type") === "delete"))
    assert(delRows.map(_._1) == Set(2L, 12L))
    // the upsert commit: one eq-deleted pre-image, two inserted rows
    val upsDel = rowsOf(ranged.filter(col("_commit_snapshot_id") === chain(3).snapshotId &&
      col("_change_type") === "delete"))
    val upsIns = rowsOf(ranged.filter(col("_commit_snapshot_id") === chain(3).snapshotId &&
      col("_change_type") === "insert"))
    assert(upsDel.map(_._1) == Set(5L) && upsDel.head._2 != "UPSERTED")
    assert(upsIns == Set((5L, "UPSERTED", 9L), (100L, "NEW ROW", 9L)))

    // a start snapshot off the consumed ancestry refuses loudly
    val err = intercept[IllegalArgumentException] {
      GraftTable.changelog(spark, dir, startSnapshotId = Some(999L))
    }
    assert(err.getMessage.contains("not an ancestor"))

    // the SQL procedure registers the view over the same rows
    val view = spark.sql(
      "CALL gcl.system.create_changelog_view(table => 'db.t', changelog_view => 'tchanges')")
      .head.getString(0)
    assert(view == "tchanges")
    assert(spark.table("tchanges").count() == GraftTable.changelog(spark, dir).count())
  }

  test("v3 deletion-vector commits emit their deletes; merged DVs never double-emit") {
    val wh = java.nio.file.Files.createTempDirectory("graft-changelog-dv").toString
    spark.conf.set("spark.sql.catalog.gcldv", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcldv.warehouse", wh)
    spark.sql("CREATE TABLE gcldv.db.t (k BIGINT, v STRING) TBLPROPERTIES (" +
      "'format-version'='3', 'commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO gcldv.db.t " +
      "SELECT /*+ REPARTITION(1) */ id, concat('v', id) FROM range(0, 20)")
    // two DV DELETEs; the second MERGES the first file's DV — its bitmap
    // re-asserts positions 0..4, which must NOT re-emit as deletes
    spark.sql("DELETE FROM gcldv.db.t WHERE k < 5")
    spark.sql("DELETE FROM gcldv.db.t WHERE k < 9")
    val dir = s"$wh/db/t"
    val log = GraftTable.changelog(spark, dir)
      .select("k", "_change_type", "_change_ordinal").collect()
    val inserts = log.filter(_.getString(1) == "insert").map(_.getLong(0)).toSet
    assert(inserts == (0L until 20L).toSet)
    val delsByOrdinal = log.filter(_.getString(1) == "delete")
      .groupBy(_.getInt(2)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(delsByOrdinal.values.map(_.size).sum == 9,
      s"merged DV must not double-emit: $delsByOrdinal")
    assert(delsByOrdinal.values.reduce(_ ++ _) == (0L until 9L).toSet)
    // per-commit split: first DELETE emits 0..4, second only 5..8
    val ords = delsByOrdinal.keys.toSeq.sorted
    assert(delsByOrdinal(ords.head) == (0L until 5L).toSet, delsByOrdinal.toString)
    assert(delsByOrdinal(ords.last) == (5L until 9L).toSet, delsByOrdinal.toString)
  }
}
