package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.iceberg._

/** DPP-style runtime filtering on the DSv2 scan
  * (`SupportsRuntimeFiltering`): a broadcast join's build side
  * materializes, Spark hands its key set to the probe-side scan as
  * In-filters, and planning re-runs — manifests prune in transform
  * space, files prune on bound stats, before any fact byte is read.
  * The proof is destructive: the partitions the runtime filter must
  * exclude are corrupted on disk, so the join answers only if they were
  * never scanned. */
class RuntimeFilterSpec extends SparkSpec {

  private val T0 = 1700000000000L

  test("a broadcast join's keys prune fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rtf").toString
    import spark.implicits._
    GraftTable.create(dir, IcebergSchema(0, Seq(
      IcebergField(1, "k", required = false, "long"),
      IcebergField(2, "r", required = false, "int"),
      IcebergField(3, "v", required = false, "string"))),
      tableUuid = "b6b9a6a1-0000-4000-8000-0000000000f1", timestampMs = T0,
      spec = PartitionSpec(0, Seq(PartitionField("r_id", "identity", 2, 1000))))
    spark.range(0, 80)
      .select(col("id").as("k"), (col("id") % 4).cast("int").as("r"),
        concat(lit("v"), col("id")).as("v"))
      .write.format("graft-table")
      .option("metadata", GraftTable.latestMetadataPath(dir))
      .mode("append").save()
    val metaPath = GraftTable.latestMetadataPath(dir)
    // corrupt every data file OUTSIDE partition r=1: the join below can
    // only succeed if the runtime filter keeps them unread
    val meta = TableMetadata.parseFile(metaPath)
    val entries = ManifestListReader.read(meta.currentSnapshot.get.manifestList.get)
      .filter(_.content == 0).flatMap(i => ManifestWriter.read(i.path))
    val doomed = entries.filter(e =>
      SingleValueCodec.decode(IcebergTypes.TInt, e.lowerBounds(2)) != 1)
    assert(doomed.size == 3, s"expected 3 non-r1 files, got ${doomed.size}")
    doomed.foreach(e => java.nio.file.Files.write(
      java.nio.file.Paths.get(e.filePath),
      "corrupted: runtime filtering must keep this unread".getBytes))

    // the DPP benefit heuristic reads table stats sized for real data;
    // pin it for KB-scale test tables (values restored below)
    val pinned = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0")
    val saved = pinned.map { case (k, _) => k -> spark.conf.getOption(k) }
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.format("graft-table").option("metadata", metaPath).load()
      // the dim must be a real source with a surviving Filter node — a
      // local relation folds the filter away and DPP sees no selective
      // predicate to propagate
      val dimPath = s"$dir/dim"
      Seq((1, "one"), (2, "two"), (7, "seven")).toDF("r", "name")
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath).filter(col("name") === "one")
      val joined = fact.join(broadcast(dim), "r")
      // the mechanism must be IN the plan before execution: a runtime
      // pruning subquery feeding the BatchScan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(3000))
      val rows = joined.select("k").collect().map(_.getLong(0)).sorted
      assert(rows.length == 20 && rows.forall(_ % 4 == 1))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
