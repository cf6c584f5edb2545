package graft.iceberg

import graft.SparkSpec

/** Per-ref retention (the spec's ref attributes): a tag with
  * max-ref-age-ms AUTO-DROPS at expiry once its snapshot's age exceeds
  * it (no drop_tag run needed); a surviving retention-bearing branch
  * RETAINS its head and min-snapshots-to-keep ancestors instead of
  * aborting the expiry; bare refs keep the strict i77 contract (pin
  * forever, expiry aborts). Fixture commit times are the synthetic 2023
  * epoch, so "aged out" vs "fresh" is driven by tiny vs enormous
  * max-ref-age values. */
class RefRetentionSpec extends SparkSpec {

  private val KeepForever = java.lang.Long.MAX_VALUE / 4

  test("aged tags auto-drop; retention branches retain ancestors; bare refs abort") {
    val wh = java.nio.file.Files.createTempDirectory("graft-refret").toString
    spark.conf.set("spark.sql.catalog.grr",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grr.warehouse", wh)
    spark.sql("CREATE TABLE grr.db.t (k BIGINT) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    val dir = s"$wh/db/t"
    // four commits: s1..s4
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO grr.db.t SELECT $i"))

    // an AGED tag on s1 (its snapshot timestamp is the 2023 epoch, far
    // older than 1 ms): expiry must drop the ref itself and proceed
    spark.sql("CALL grr.system.create_tag(table => 'db.t', tag => 'aged', " +
      "snapshot_id => 1, max_ref_age_ms => 1)")
    // a retention BRANCH on s3 keeping its head + 1 ancestor (s2, s3)
    spark.sql("CALL grr.system.create_branch(table => 'db.t', branch => 'keepish', " +
      s"snapshot_id => 3, max_ref_age_ms => ${KeepForever}L, " +
      "min_snapshots_to_keep => 2)")
    spark.sql("CALL grr.system.expire_snapshots(table => 'db.t', retain_last => 1)")
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    assert(meta.refs.map(_.name).toSet == Set("main", "keepish"),
      s"aged tag must auto-drop: ${meta.refs}")
    // retained: s4 (keepLast), s3 (branch head), s2 (min-snapshots-to-keep)
    assert(meta.snapshots.map(_.snapshotId).sorted == Seq(2L, 3L, 4L),
      meta.snapshots.map(_.snapshotId).toString)
    // the branch still time-travels
    assert(spark.sql("SELECT count(*) FROM grr.db.t VERSION AS OF 'keepish'")
      .head().getLong(0) == 3L)

    // a BARE tag keeps the strict contract: expiry aborts while it pins
    // (s4 — a snapshot nothing else retains once s5 becomes the head)
    spark.sql("CALL grr.system.create_tag(table => 'db.t', tag => 'pin', " +
      "snapshot_id => 4)")
    spark.sql("INSERT INTO grr.db.t SELECT 5")
    val pinned = scala.util.Try(spark.sql(
      "CALL grr.system.expire_snapshots(table => 'db.t', retain_last => 1)"))
    assert(pinned.isFailure, "bare refs must keep the abort contract")
    // the retention attributes survive the round trip through the doc
    val ref = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
      .refs.find(_.name == "keepish").get
    assert(ref.minSnapshotsToKeep.contains(2) &&
      ref.maxRefAgeMs.contains(KeepForever), ref.toString)
  }
}
