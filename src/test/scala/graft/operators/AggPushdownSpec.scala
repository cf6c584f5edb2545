package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.iceberg._

/** Aggregate pushdown from manifest stats: COUNT(*)/MIN/MAX on a clean
  * table answer from ONE KB-scale metadata pass — no data bytes read,
  * proven destructively by corrupting every data file first. Exactness
  * gates: pending deletes, floating-point extremes, or missing bounds
  * refuse the push and fall back to the ordinary scan. */
class AggPushdownSpec extends SparkSpec {

  private val T0 = 1700000000000L

  private def freshTable(tail: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-aggpd").toString
    GraftTable.create(dir, IcebergSchema(0, Seq(
      IcebergField(1, "n_nationkey", required = false, "int"),
      IcebergField(2, "n_name", required = false, "string"),
      IcebergField(3, "n_regionkey", required = false, "int"))),
      tableUuid = s"b6b9a6a1-0000-4000-8000-0000000000$tail", timestampMs = T0)
    GraftTable.append(spark, dir, Tables.load(spark, sfDir, "nation"))
    dir
  }

  test("COUNT(*)/MIN/MAX answer from stats with every data file corrupted") {
    val dir = freshTable("a1")
    val metaPath = GraftTable.latestMetadataPath(dir)
    // destructive proof: corrupt EVERY data file — only a stats-served
    // answer can succeed
    val meta = TableMetadata.parseFile(metaPath)
    ManifestListReader.read(meta.currentSnapshot.get.manifestList.get)
      .flatMap(i => ManifestWriter.read(i.path)).filter(_.content == 0)
      .foreach(e => java.nio.file.Files.write(java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(e.filePath).toUri.getPath),
        "corrupted: aggregates must come from manifest stats".getBytes))
    val df = spark.read.format("graft-table").option("metadata", metaPath).load()
      .agg(count(lit(1)).as("n"), min(col("n_nationkey")).as("lo"),
        max(col("n_nationkey")).as("hi"), max(col("n_name")).as("topname"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected stats-served local scan:\n$plan")
    val row = df.head()
    val want = Tables.load(spark, sfDir, "nation")
      .agg(count(lit(1)), min(col("n_nationkey")), max(col("n_nationkey")),
        max(col("n_name"))).head()
    assert(row.getLong(0) == want.getLong(0))
    assert(row.getInt(1) == want.getInt(1) && row.getInt(2) == want.getInt(2))
    assert(row.getString(3) == want.getString(3))
  }

  test("truncated string bounds on a foreign table refuse MIN/MAX; numerics still serve") {
    val dir = freshTable("a4")
    // simulate a FOREIGN writer: no graft.metrics=full stamp, and the
    // string bounds truncated the way production Iceberg writers do by
    // default (truncate(16)): lower = prefix, upper = prefix with the
    // last char incremented — a value that need NOT exist in the data.
    // Serving MAX(n_name) from these would return "VJ", which no row holds.
    GraftTable.removeProperties(dir, Seq("graft.metrics"))
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val nameId = 2
    meta.currentSnapshot.flatMap(_.manifestList).toSeq
      .flatMap(ManifestListReader.read).filter(_.content == 0).foreach { i =>
        val entries = ManifestWriter.read(i.path).map(e => e.copy(
          lowerBounds = e.lowerBounds.updated(nameId,
            SingleValueCodec.encode(IcebergTypes.TString, "AL")),
          upperBounds = e.upperBounds.updated(nameId,
            SingleValueCodec.encode(IcebergTypes.TString, "VJ"))))
        ManifestWriter.write(i.path, entries)
      }
    val metaPath = GraftTable.latestMetadataPath(dir)
    val strAgg = spark.read.format("graft-table").option("metadata", metaPath)
      .load().agg(max(col("n_name")).as("topname"))
    assert(!strAgg.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "string MAX on an unstamped table must fall back to the scan")
    val want = Tables.load(spark, sfDir, "nation").agg(max(col("n_name"))).head()
    assert(strAgg.head().getString(0) == want.getString(0),
      "the scan fallback must return the TRUE max, not the truncated bound")
    // numeric bounds are exact single-value encodings whenever present —
    // the same unstamped table still serves COUNT/MIN/MAX(int) from stats
    val numAgg = spark.read.format("graft-table").option("metadata", metaPath)
      .load().agg(count(lit(1)).as("n"), min(col("n_nationkey")).as("lo"),
        max(col("n_nationkey")).as("hi"))
    assert(numAgg.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "numeric aggregates must still stats-serve without the stamp")
    assert(numAgg.head().getLong(0) == 25L)
  }

  test("pending deletes, filters, and grouped aggregates refuse the push") {
    val dir = freshTable("a2")
    GraftTable.deleteWhere(spark, dir, col("n_regionkey") === 2)
    val metaPath = GraftTable.latestMetadataPath(dir)
    val withDeletes = spark.read.format("graft-table").option("metadata", metaPath)
      .load().agg(count(lit(1)))
    assert(!withDeletes.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "deletes must refuse the stats answer")
    assert(withDeletes.head().getLong(0) ==
      Tables.load(spark, sfDir, "nation").filter(col("n_regionkey") =!= 2).count())
    // a filtered aggregate keeps the ordinary scan (residual filters)
    val clean = freshTable("a3")
    val filtered = spark.read.format("graft-table")
      .option("metadata", GraftTable.latestMetadataPath(clean)).load()
      .filter(col("n_regionkey") === 1).agg(count(lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(filtered.head().getLong(0) ==
      Tables.load(spark, sfDir, "nation").filter(col("n_regionkey") === 1).count())
    // grouped aggregates scan too
    val grouped = spark.read.format("graft-table")
      .option("metadata", GraftTable.latestMetadataPath(clean)).load()
      .groupBy(col("n_regionkey")).agg(count(lit(1)))
    assert(!grouped.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(grouped.count() == 5)
  }
}
