package graft.iceberg

import graft.SparkSpec

/** CAS commit protocol: interleaved committers both land, losers refresh
  * and re-apply on the winner's document, the snapshot log stays linear,
  * and a committer that can never win aborts loudly. */
class OptimisticCommitSpec extends SparkSpec {

  private val T0 = 1700000000000L

  private def freshTable(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
    val base = TableMetadata(
      formatVersion = 2, tableUuid = "b6b9a6a1-0000-4000-8000-0000000000cc",
      location = dir, lastUpdatedMs = T0,
      topLevelSchema = None, currentSchemaId = Some(0),
      schemas = Seq(IcebergSchema(0, Seq(IcebergField(1, "k", required = false, "int")))),
      partitionSpecs = Seq(PartitionSpec(0, Nil)), defaultSpecId = 0,
      sortOrders = Seq(SortOrder(0, Nil)), defaultSortOrderId = 0,
      properties = Map.empty, currentSnapshotId = Some(1L),
      refs = Seq(SnapshotRef("main", "branch", 1L)),
      snapshots = Seq(Snapshot(1L, None, T0, Some("append"), Map.empty, None, Some(0))),
      snapshotLog = Seq(SnapshotLogEntry(T0, 1L)), metadataLog = Nil)
    MetadataWriter.write(OptimisticCommit.metadataPath(dir, 1), base)
    dir
  }

  private def appendUpdate(snapId: Long): (TableMetadata, String) => TableMetadata =
    (base, basePath) => MetadataWriter.commitSnapshot(base,
      Snapshot(snapId, base.currentSnapshotId, base.lastUpdatedMs + 1000,
        Some("append"), Map.empty, None, Some(0)),
      Some(basePath))

  test("a committer that loses the race refreshes and re-applies on the winner") {
    val dir = freshTable("cas1")
    var interposed = false
    // A's first apply happens against v1; B commits v2 before A publishes,
    // so A's claim of v2 must fail and its retry must re-derive snapshot
    // 100 with B's snapshot 200 as parent
    val a = OptimisticCommit.commit(dir, (base, basePath) => {
      if (!interposed) {
        interposed = true
        val b = OptimisticCommit.commit(dir, appendUpdate(200L))
        assert(b.version == 2 && b.attempts == 1)
      }
      appendUpdate(100L)(base, basePath)
    })
    assert(a.version == 3)
    assert(a.attempts == 2)
    val finalMeta = TableMetadata.parseFile(OptimisticCommit.metadataPath(dir, 3))
    assert(finalMeta.currentSnapshotId.contains(100L))
    assert(finalMeta.snapshot(100L).get.parentSnapshotId.contains(200L))
    assert(finalMeta.snapshots.map(_.snapshotId) == Seq(1L, 200L, 100L))
    // linear history: each log entry's snapshot descends from the previous
    val log = finalMeta.snapshotLog.map(_.snapshotId)
    assert(log == Seq(1L, 200L, 100L))
    log.sliding(2).foreach { case Seq(p, c) =>
      assert(finalMeta.snapshot(c).get.parentSnapshotId.contains(p))
    case _ => () }
  }

  test("a committer that can never win aborts after maxAttempts") {
    val dir = freshTable("cas2")
    var n = 300L
    intercept[OptimisticCommit.CommitConflictException] {
      OptimisticCommit.commit(dir, (base, basePath) => {
        n += 1 // an opponent lands a commit on EVERY attempt
        OptimisticCommit.commit(dir, appendUpdate(n))
        appendUpdate(100L)(base, basePath)
      }, maxAttempts = 3)
    }
    // the opponent's three commits are all durable; nothing torn
    assert(OptimisticCommit.currentVersion(dir) == 4)
  }

  test("version-hint.text accelerates refresh and tolerates staleness") {
    val dir = freshTable("cas4")
    val r = OptimisticCommit.commit(dir, appendUpdate(50L))
    assert(r.version == 2)
    val hint = java.nio.file.Paths.get(dir, "version-hint.text")
    assert(java.nio.file.Files.readString(hint).trim == "2")
    // stale hint: points at v1 while v2 exists — refresh walks forward
    java.nio.file.Files.writeString(hint, "1")
    assert(OptimisticCommit.currentVersion(dir) == 2)
    // garbage hint: falls back to the directory listing
    java.nio.file.Files.writeString(hint, "not-a-number")
    assert(OptimisticCommit.currentVersion(dir) == 2)
    // hint ahead of reality (crashed writer): ignored, listing wins
    java.nio.file.Files.writeString(hint, "99")
    assert(OptimisticCommit.currentVersion(dir) == 2)
  }

  test("an update that finds its sources gone aborts instead of retrying") {
    val dir = freshTable("cas5")
    // a rewrite-style update validates its planned inputs against the
    // refreshed base and must ABORT (throw through the CAS loop, no
    // retry) when a concurrent commit invalidated them
    var attempts = 0
    val e = intercept[OptimisticCommit.CommitConflictException] {
      OptimisticCommit.commit(dir, (base, basePath) => {
        attempts += 1
        throw OptimisticCommit.CommitConflictException(
          "compaction sources removed by a concurrent commit: data/f1.parquet")
      })
    }
    assert(attempts == 1, "validation failure must abort, not burn retries")
    assert(e.getMessage.contains("sources removed"))
    assert(OptimisticCommit.currentVersion(dir) == 1) // nothing published
  }

  test("eight racing committers all land; the log is linear") {
    val dir = freshTable("cas3")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val results = try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence((0 until 8).map(i =>
        scala.concurrent.Future(
          OptimisticCommit.commit(dir, appendUpdate(100L + i), maxAttempts = 32)))),
      scala.concurrent.duration.Duration(120, "s"))
    finally pool.shutdown()
    assert(OptimisticCommit.currentVersion(dir) == 9)
    assert(results.map(_.version).sorted == (2 to 9))
    val finalMeta = TableMetadata.parseFile(OptimisticCommit.metadataPath(dir, 9))
    assert(finalMeta.snapshots.size == 9)
    assert(finalMeta.snapshots.map(_.snapshotId).toSet ==
      (Set(1L) ++ (0 until 8).map(100L + _)))
    // serializable history: the parent chain threads every commit
    val log = finalMeta.snapshotLog.map(_.snapshotId)
    assert(log.size == 9 && log.head == 1L)
    log.sliding(2).foreach { case Seq(p, c) =>
      assert(finalMeta.snapshot(c).get.parentSnapshotId.contains(p),
        s"snapshot $c must chain to $p")
    case _ => () }
  }
}
