package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.iceberg._

/** delete_reachable_files guards: the gc.enabled=false fork refusal, the
  * stale-document refusal, and dry-run leaving every byte in place. */
class DeleteReachableSpec extends SparkSpec {

  private def mkTable(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-drf-$tag").toString + "/t"
    GraftTable.create(dir, IcebergSchema(0, Seq(
      IcebergField(1, "k", required = false, "int"))),
      tableUuid = s"b6b9a6a1-0000-4000-8000-00000000d0f$tag",
      timestampMs = 1700000000000L)
    import spark.implicits._
    GraftTable.append(spark, dir, Seq(1, 2, 3).toDF("k").coalesce(1))
    dir
  }

  test("dry run counts without deleting; the real run leaves nothing") {
    val dir = mkTable("a")
    val dry = GraftTable.deleteReachableFiles(spark,
      GraftTable.latestMetadataPath(dir), dryRun = true)
    assert(dry.contentFilesCount == 1 && dry.manifestLists.size == 1)
    assert(GraftTable.read(spark, GraftTable.latestMetadataPath(dir)).count() == 3,
      "dry run must not delete anything")
    val real = GraftTable.deleteReachableFiles(spark, GraftTable.latestMetadataPath(dir))
    assert(real == dry)
    val fs = HadoopConfs.fileSystemFor(dir)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    assert(!it.hasNext, "every reachable file must be gone")
  }

  test("a gc.enabled=false fork refuses — its files belong to the source") {
    val src = mkTable("b")
    val dst = src.stripSuffix("/t") + "/fork"
    GraftTable.snapshotTable(src, dst)
    val e = intercept[IllegalArgumentException] {
      GraftTable.deleteReachableFiles(spark, GraftTable.latestMetadataPath(dst))
    }
    assert(e.getMessage.contains("gc.enabled"), e.getMessage)
    assert(GraftTable.read(spark, GraftTable.latestMetadataPath(src)).count() == 3)
  }

  test("a superseded document refuses — newer state may reference the files") {
    val dir = mkTable("c")
    val stale = GraftTable.latestMetadataPath(dir)
    import spark.implicits._
    GraftTable.append(spark, dir, Seq(4).toDF("k")) // advances to v3
    val e = intercept[IllegalArgumentException] {
      GraftTable.deleteReachableFiles(spark, stale)
    }
    assert(e.getMessage.contains("current metadata"), e.getMessage)
    assert(GraftTable.read(spark, GraftTable.latestMetadataPath(dir)).count() == 4)
  }
}
