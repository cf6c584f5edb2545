package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.iceberg._

/** Sort-order-aware DSv2 writes: a table's declared sort order becomes
  * the write's required distribution (range, unpartitioned tables) and
  * per-task ordering, so files land as DISJOINT sorted key ranges with
  * tight bound stats — prunable with no rewrite step. */
class SortedWriteSpec extends SparkSpec {

  private val T0 = 1700000000000L

  test("a declared sort order range-clusters files; bounds prune destructively") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sortw").toString
    GraftTable.create(dir, IcebergSchema(0, Seq(
      IcebergField(1, "k", required = false, "long"),
      IcebergField(2, "v", required = false, "string"))),
      tableUuid = "b6b9a6a1-0000-4000-8000-0000000000s1", timestampMs = T0)
    GraftTable.evolveSortOrder(dir,
      SortOrder(1, Seq(SortField("identity", 1, "asc", "nulls-first"))))
    // scrambled input, multiple partitions: only the write's required
    // range distribution + ordering can make the files disjoint. (AQE
    // would coalesce this KB-scale shuffle into one task; disable
    // coalescing so the test observes multiple range-disjoint files.)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try spark.range(0, 40000)
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))
      .orderBy(hash(col("id"))).repartition(8)
      .write.format("graft-table")
      .option("metadata", GraftTable.latestMetadataPath(dir))
      .mode("append").save()
    finally spark.conf.set(coalesceKey, saved)
    val metaPath = GraftTable.latestMetadataPath(dir)
    val meta = TableMetadata.parseFile(metaPath)
    val entries = ManifestListReader.read(meta.currentSnapshot.get.manifestList.get)
      .filter(_.content == 0).flatMap(i => ManifestWriter.read(i.path))
    assert(entries.size > 1, "expected multiple task files")
    def lo(e: ManifestWriter.EntryData) =
      SingleValueCodec.decode(IcebergTypes.TLong, e.lowerBounds(1)).asInstanceOf[Long]
    def hi(e: ManifestWriter.EntryData) =
      SingleValueCodec.decode(IcebergTypes.TLong, e.upperBounds(1)).asInstanceOf[Long]
    // disjoint tight ranges: sorted by lower bound, each file's max sits
    // below the next file's min
    val ranges = entries.map(e => (lo(e), hi(e))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(h1 < l2, s"overlapping ranges: $ranges")
      case _ => ()
    }
    // destructive pruning proof: a point query must read exactly one file
    val target = entries.find(e => lo(e) <= 12345L && hi(e) >= 12345L).get
    entries.filterNot(_ == target).foreach(e => java.nio.file.Files.write(
      java.nio.file.Paths.get(e.filePath),
      "corrupted: sorted-write bounds must keep this unopened".getBytes))
    val got = spark.read.format("graft-table").option("metadata", metaPath)
      .load().filter(col("k") === 12345L).collect()
    assert(got.length == 1 && got.head.getString(1) == "v12345")
  }

  test("GraftTable.append honors the declared sort order (range-disjoint files)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sorta").toString
    GraftTable.create(dir, IcebergSchema(0, Seq(
      IcebergField(1, "k", required = false, "long"),
      IcebergField(2, "v", required = false, "string"))),
      tableUuid = "b6b9a6a1-0000-4000-8000-0000000000s2", timestampMs = T0)
    GraftTable.evolveSortOrder(dir,
      SortOrder(1, Seq(SortField("identity", 1, "asc", "nulls-first"))))
    // the convenience API routes through the same DSv2 write — the sort
    // order's range distribution applies, no coalesce(1) funnel
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try GraftTable.append(spark, dir,
      spark.range(0, 40000)
        .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))
        .orderBy(hash(col("id"))).repartition(8))
    finally spark.conf.set(coalesceKey, saved)
    val entries = ManifestListReader.read(TableMetadata
        .parseFile(GraftTable.latestMetadataPath(dir))
        .currentSnapshot.get.manifestList.get)
      .filter(_.content == 0).flatMap(i => ManifestWriter.read(i.path))
    assert(entries.size > 1, "expected multiple range-clustered task files")
    def lo(e: ManifestWriter.EntryData) =
      SingleValueCodec.decode(IcebergTypes.TLong, e.lowerBounds(1)).asInstanceOf[Long]
    def hi(e: ManifestWriter.EntryData) =
      SingleValueCodec.decode(IcebergTypes.TLong, e.upperBounds(1)).asInstanceOf[Long]
    val ranges = entries.map(e => (lo(e), hi(e))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(h1 < l2, s"overlapping ranges: $ranges")
      case _ => ()
    }
  }
}
