package graft.iceberg

import graft.{SparkSpec, Tables}

/** `compute_table_stats` → the metadata `statistics` entry → the scan's
  * V2 columnStats → Spark CBO attribute statistics: the whole ANALYZE
  * loop, plus the staleness/expiry rules around it. */
class TableStatsSpec extends SparkSpec {

  test("ANALYZE lands a statistics file and CBO sees per-column stats") {
    val wh = java.nio.file.Files.createTempDirectory("graft-stats").toString
    spark.conf.set("spark.sql.catalog.gstat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstat.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("gstat_nation")
    spark.sql("CREATE TABLE gstat.db.t (k BIGINT, name STRING, r BIGINT)")
    spark.sql("""INSERT INTO gstat.db.t
      SELECT n_nationkey, CASE WHEN n_nationkey = 3 THEN NULL ELSE n_name END,
        n_regionkey FROM gstat_nation""")
    val dir = s"$wh/db/t"

    val out = spark.sql("CALL gstat.system.compute_table_stats(table => 'db.t')").head
    assert(out.getLong(1) == 25L, "row_count")
    assert(out.getInt(2) == 3, "analyzed_columns_count")
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    assert(meta.statistics.size == 1 &&
      meta.statistics.head.snapshotId == out.getLong(0))
    val doc = TableStats.read(meta.statistics.head.path)
    assert(doc.rowCount == 25L)
    // the blob is a spec-layout Puffin container: leading magic, a
    // trailing [Magic|payload|size(i32 LE)|flags|Magic] footer, blob
    // offsets/lengths that really address the bodies, and the recorded
    // file size exact
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(meta.statistics.head.path))
    assert(raw.length.toLong == meta.statistics.head.fileSizeInBytes)
    val magic = "PFA1".getBytes("UTF-8")
    assert(raw.take(4).sameElements(magic) && raw.takeRight(4).sameElements(magic))
    val psize = java.nio.ByteBuffer.wrap(raw, raw.length - 12, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val footerJson = new String(raw, raw.length - 12 - psize, psize, "UTF-8")
    val footer = new com.fasterxml.jackson.databind.ObjectMapper().readTree(footerJson)
    import scala.jdk.CollectionConverters._
    val blobs = footer.get("blobs").elements().asScala.toSeq
    assert(blobs.size == 3)
    blobs.foreach { b =>
      val off = b.get("offset").asLong.toInt
      val len = b.get("length").asLong.toInt
      val body = new String(raw, off, len, "UTF-8")
      assert(body.startsWith("{") && body.contains("ndv"), body)
    }
    // exact quantities exact, the HLL estimate within its error bound
    val kId = meta.currentSchema.fields.find(_.name == "k").get.id
    val nameId = meta.currentSchema.fields.find(_.name == "name").get.id
    assert(doc.columns(nameId).nullCount == 1L)
    assert(math.abs(doc.columns(kId).ndv - 25L) <= 2L, doc.columns(kId).toString)

    // re-analyzing the SAME snapshot replaces, never accumulates — and
    // the replaced blob reclaims immediately
    spark.sql("CALL gstat.system.compute_table_stats(table => 'db.t')")
    val afterReplace = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    assert(afterReplace.statistics.size == 1)
    assert(!new java.io.File(meta.statistics.head.path).exists(),
      "replaced stats blob must reclaim")

    // CBO: the optimized scan relation carries attribute stats — NDV and
    // null count from the blob, min/max from the manifest bounds
    val prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.sql("SELECT k, name FROM gstat.db.t")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)), stats.toString)
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      val kStat = byName("k")
      assert(kStat.distinctCount.exists(d => (d - 25).abs <= 2), kStat.toString)
      assert(kStat.min.contains(0L) && kStat.max.contains(24L), kStat.toString)
      assert(byName("name").nullCount.contains(BigInt(1)), byName("name").toString)

      // a FILTERED scan refuses column stats (they'd describe the wrong
      // relation); the plain row-count estimate machinery still works
      val filtered = spark.sql("SELECT k FROM gstat.db.t WHERE k > 5")
        .queryExecution.optimizedPlan.collectLeaves().head.stats
      assert(filtered.attributeStats.isEmpty, filtered.toString)

      // a new commit makes the blob stale: NDV no longer served (wrong
      // snapshot), manifest-derived min/max still exact and served
      spark.sql("INSERT INTO gstat.db.t VALUES (100, 'extra', 9)")
      val after = spark.sql("SELECT k FROM gstat.db.t")
        .queryExecution.optimizedPlan.stats
      val kAfter = after.attributeStats.map { case (a, s) => a.name -> s }("k")
      assert(kAfter.distinctCount.isEmpty, kAfter.toString)
      assert(kAfter.max.contains(100L), kAfter.toString)

      // pending deletes drop ALL column stats (visible rows unknowable
      // from metadata)
      spark.sql("DELETE FROM gstat.db.t WHERE k = 100")
      val deleted = spark.sql("SELECT k FROM gstat.db.t")
        .queryExecution.optimizedPlan.stats
      assert(deleted.attributeStats.isEmpty, deleted.toString)
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)

    // expiring the analyzed snapshot reclaims its statistics entry AND
    // the physical blob
    val statsPath = afterReplace.statistics.head.path
    assert(new java.io.File(statsPath).exists())
    spark.sql("CALL gstat.system.rewrite_data_files(table => 'db.t')")
    spark.sql("CALL gstat.system.expire_snapshots('db.t', 1)")
    val finalMeta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    assert(finalMeta.statistics.isEmpty, finalMeta.statistics.toString)
    assert(!new java.io.File(statsPath).exists(), "expired stats blob must reclaim")
  }
}
