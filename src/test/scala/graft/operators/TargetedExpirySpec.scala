package graft.operators

import graft.SparkSpec
import graft.iceberg.{GraftTable, ManifestListReader, ManifestWriter, TableMetadata}

/** Targeted snapshot expiry — `expire_snapshots(snapshot_ids => ...)`
  * (upstream's signature): exactly the named snapshots expire, guarded
  * by the PIN rules (current / ref-pinned / unknown refuse) rather than
  * retention policy. The headline workflow is deliberate stage
  * reclamation: the publish-refusal messages tell users expiry reclaims
  * an abandoned stage — naming it does so NOW, without waiting out an
  * age window or disturbing the rest of history. */
class TargetedExpirySpec extends SparkSpec {

  private def meta(dir: String): TableMetadata =
    TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))

  /** Data files ADDED BY the snapshot (its own manifests only — carried
    * manifests keep their entries at status 1 and must not count). */
  private def dataFilesOf(m: TableMetadata, snapId: Long): Seq[String] =
    m.snapshots.find(_.snapshotId == snapId).flatMap(_.manifestList).toSeq
      .flatMap(ManifestListReader.read)
      .filter(i => i.content == 0 && i.addedSnapshotId == snapId)
      .flatMap(i => ManifestWriter.read(i.path))
      .filter(e => e.status == 1 && e.content == 0).map(_.filePath)

  test("snapshot_ids reclaims exactly the named abandoned stage; the " +
      "published stage and main history survive") {
    val wh = java.nio.file.Files.createTempDirectory("graft-texp").toString
    spark.conf.set("spark.sql.catalog.gtex", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtex.warehouse", wh)
    spark.sql("CREATE TABLE gtex.db.t (k BIGINT, s STRING) " +
      "TBLPROPERTIES ('write.wap.enabled' = 'true')")
    spark.sql("INSERT INTO gtex.db.t VALUES (1, 'base')")
    val dir = s"$wh/db/t"
    // two staged commits; publish only the first
    spark.conf.set("spark.wap.id", "keepme")
    try spark.sql("INSERT INTO gtex.db.t VALUES (2, 'published')")
    finally spark.conf.unset("spark.wap.id")
    spark.sql("CALL gtex.system.publish_changes('db.t', 'keepme')")
    spark.conf.set("spark.wap.id", "abandonme")
    try spark.sql("INSERT INTO gtex.db.t VALUES (3, 'abandoned')")
    finally spark.conf.unset("spark.wap.id")
    val m0 = meta(dir)
    val stage = m0.snapshots.find(s =>
      s.summary.get("wap.id").contains("abandonme")).get
    val stageFiles = dataFilesOf(m0, stage.snapshotId)
    assert(stageFiles.nonEmpty)
    val keptFiles = m0.snapshots.filterNot(_.snapshotId == stage.snapshotId)
      .flatMap(s => dataFilesOf(m0, s.snapshotId))
    assert(keptFiles.nonEmpty)
    val out = spark.sql("CALL gtex.system.expire_snapshots(" +
      s"table => 'db.t', snapshot_ids => array(${stage.snapshotId}L))").head
    assert(out.getInt(0) == 1, out.toString)
    val m1 = meta(dir)
    assert(!m1.snapshots.exists(_.snapshotId == stage.snapshotId))
    assert(stageFiles.forall(p => !java.nio.file.Files.exists(
        java.nio.file.Paths.get(p.stripPrefix("file:")))),
      "the abandoned stage's data files must be physically reclaimed")
    assert(keptFiles.forall(p => java.nio.file.Files.exists(
        java.nio.file.Paths.get(p.stripPrefix("file:")))),
      "every other snapshot's files must survive the surgical expiry")
    // everything else intact: base + published rows, full remaining
    // history (targeted expiry is surgical, not a retention sweep)
    assert(m1.snapshots.size == m0.snapshots.size - 1)
    val rows = spark.sql("SELECT k, s FROM gtex.db.t ORDER BY k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L), rows.mkString)
  }

  test("mid-history expiry by id keeps the head serving; pin rules refuse") {
    val wh = java.nio.file.Files.createTempDirectory("graft-texm").toString
    spark.conf.set("spark.sql.catalog.gtem", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtem.warehouse", wh)
    spark.sql("CREATE TABLE gtem.db.t (k BIGINT)")
    spark.sql("INSERT INTO gtem.db.t SELECT id FROM RANGE(5)")
    spark.sql("INSERT INTO gtem.db.t SELECT id FROM RANGE(5, 10)")
    spark.sql("INSERT INTO gtem.db.t SELECT id FROM RANGE(10, 15)")
    val dir = s"$wh/db/t"
    val m0 = meta(dir)
    val Seq(first, middle, head) = m0.snapshots.sortBy(_.snapshotId)
    spark.sql(s"CALL gtem.system.create_tag('db.t', 'pin1', ${first.snapshotId}L)")
    // refusals: the current head, a tag-pinned snapshot, an unknown id,
    // and combining the two expiry modes
    for ((bad, needle) <- Seq(
        (s"snapshot_ids => array(${head.snapshotId}L)", "current snapshot"),
        (s"snapshot_ids => array(${first.snapshotId}L)", "pinned by refs"),
        (s"snapshot_ids => array(99999L)", "no such snapshot"),
        (s"snapshot_ids => array(${middle.snapshotId}L), older_than_ms => 1",
          "exclusive"),
        // "expire these ZERO snapshots" must refuse, never degrade into
        // the retain_last=1 retention sweep (a table-wide history purge)
        ("snapshot_ids => cast(array() as array<bigint>)",
          "snapshot_ids is empty"),
        (s"snapshot_ids => array(${middle.snapshotId}L, cast(NULL as bigint))",
          "contains NULL")))
      withClue(bad) {
        val e = intercept[Exception](spark.sql(
          s"CALL gtem.system.expire_snapshots(table => 'db.t', $bad)"))
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).take(8)
          .flatMap(t => Option(t.getMessage)).mkString(" | ")
        assert(msgs.contains(needle), msgs)
      }
    // expiring the MIDDLE snapshot truncates time travel to it but the
    // head keeps every row: its carried manifests still reference the
    // middle append's files, so reachability protects them
    spark.sql("CALL gtem.system.expire_snapshots(" +
      s"table => 'db.t', snapshot_ids => array(${middle.snapshotId}L))")
    val m1 = meta(dir)
    assert(m1.snapshots.map(_.snapshotId).sorted ==
      Seq(first.snapshotId, head.snapshotId).sorted)
    // the punched lineage truncates HONESTLY at the hole: no ghost id
    // (the head's dangling parent) may ride in the chain and waste a
    // keepLast slot or poison a membership check
    assert(m1.lineage() == Seq(head.snapshotId), m1.lineage().toString)
    assert(spark.sql("SELECT COUNT(*), SUM(k) FROM gtem.db.t").head()
      .toSeq == Seq(15L, 105L))
    // and the tag still time-travels to its pinned snapshot
    assert(spark.sql(
      s"SELECT COUNT(*) FROM gtem.db.t VERSION AS OF 'pin1'").head()
      .getLong(0) == 5L)
  }

  test("targeted expiry refuses ancestors inside a branch's declared " +
      "retention window") {
    val wh = java.nio.file.Files.createTempDirectory("graft-texb").toString
    spark.conf.set("spark.sql.catalog.gteb", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gteb.warehouse", wh)
    spark.sql("CREATE TABLE gteb.db.t (k BIGINT)")
    spark.sql("INSERT INTO gteb.db.t SELECT id FROM RANGE(5)")
    spark.sql("INSERT INTO gteb.db.t SELECT id FROM RANGE(5, 10)")
    spark.sql("INSERT INTO gteb.db.t SELECT id FROM RANGE(10, 15)")
    val dir = s"$wh/db/t"
    val Seq(first, middle, _) = meta(dir).snapshots.sortBy(_.snapshotId)
    // the branch HEAD pins itself via the existing ref rule; its
    // min_snapshots_to_keep=3 window must ALSO pin both ancestors —
    // expiring one by id would punch a hole in the declared retention
    spark.sql("CALL gteb.system.create_branch(table => 'db.t', " +
      "branch => 'audit', min_snapshots_to_keep => 3)")
    for (anc <- Seq(first, middle)) withClue(anc.snapshotId) {
      val e = intercept[Exception](spark.sql(
        "CALL gteb.system.expire_snapshots(table => 'db.t', " +
          s"snapshot_ids => array(${anc.snapshotId}L))"))
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).take(8)
        .flatMap(t => Option(t.getMessage)).mkString(" | ")
      assert(msgs.contains("declared retention"), msgs)
    }
    // a bare branch (no retention properties) pins only its HEAD: the
    // strict pin-abort contract, never a silent blanket retain
    spark.sql("CALL gteb.system.drop_branch('db.t', 'audit')")
    spark.sql("CALL gteb.system.create_branch(table => 'db.t', " +
      "branch => 'bare')")
    spark.sql("CALL gteb.system.expire_snapshots(table => 'db.t', " +
      s"snapshot_ids => array(${middle.snapshotId}L))")
    assert(!meta(dir).snapshots.exists(_.snapshotId == middle.snapshotId))
  }
}
