package graft.iceberg

import org.scalatest.funsuite.AnyFunSuite

/** The metadata sink must be the exact inverse of the parser, and a commit
  * must advance every pointer a reader resolves (current snapshot, main
  * ref, snapshot-log, metadata-log). */
class MetadataWriterSpec extends AnyFunSuite {

  private val fixture = "/root/reference/src/test/resources/v1.metadata.json"

  test("toJson round-trips the fixture through the parser unchanged") {
    val parsed = TableMetadata.parseFile(fixture)
    val reparsed = TableMetadata.parse(MetadataWriter.toJson(parsed))
    assert(reparsed === parsed)
  }

  test("commitSnapshot advances pointer, ref, logs; rejects duplicate ids") {
    val base = TableMetadata.parseFile(fixture)
    val old = base.currentSnapshot.get
    val snap = Snapshot(old.snapshotId + 1, Some(old.snapshotId),
      old.timestampMs + 1000, Some("replace"),
      Map("total-data-files" -> "1"), Some("/tmp/list.avro"), old.schemaId)
    val next = MetadataWriter.commitSnapshot(base, snap, Some(fixture))
    assert(next.currentSnapshotId === Some(snap.snapshotId))
    assert(next.refs.find(_.name == "main").map(_.snapshotId) === Some(snap.snapshotId))
    assert(next.snapshots.map(_.snapshotId) === base.snapshots.map(_.snapshotId) :+ snap.snapshotId)
    assert(next.snapshotLog.last === SnapshotLogEntry(snap.timestampMs, snap.snapshotId))
    assert(next.metadataLog.last === MetadataLogEntry(base.lastUpdatedMs, fixture))
    assert(next.lastUpdatedMs === snap.timestampMs)
    // the committed document itself must round-trip too
    assert(TableMetadata.parse(MetadataWriter.toJson(next)) === next)
    // a second commit of the same id must refuse
    intercept[IllegalArgumentException](MetadataWriter.commitSnapshot(next, snap))
  }

  test("rollbackTo moves pointer and ref back, keeps all snapshots, logs the move") {
    val base = TableMetadata.parseFile(fixture)
    val old = base.currentSnapshot.get
    val snap = Snapshot(old.snapshotId + 1, Some(old.snapshotId),
      old.timestampMs + 1000, Some("replace"), Map.empty, Some("/tmp/list.avro"), old.schemaId)
    val committed = MetadataWriter.commitSnapshot(base, snap)
    val rolled = MetadataWriter.rollbackTo(committed, old.snapshotId, snap.timestampMs + 1000)
    assert(rolled.currentSnapshotId === Some(old.snapshotId))
    assert(rolled.refs.find(_.name == "main").map(_.snapshotId) === Some(old.snapshotId))
    assert(rolled.snapshots.map(_.snapshotId) === committed.snapshots.map(_.snapshotId),
      "rollback must not remove snapshots — expiry owns cleanup")
    assert(rolled.snapshotLog.map(_.snapshotId) ===
      Seq(old.snapshotId, snap.snapshotId, old.snapshotId))
    assert(TableMetadata.parse(MetadataWriter.toJson(rolled)) === rolled)
    // unknown target and no-op rollback both refuse
    intercept[IllegalArgumentException](MetadataWriter.rollbackTo(committed, 42L, 0L))
    intercept[IllegalArgumentException](
      MetadataWriter.rollbackTo(committed, snap.snapshotId, 0L))
  }
}
