package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape evidence for the format battery: the q56 partitioned-write
  * re-read must PRUNE partitions at planning — only the o_orderstatus=F
  * directory's files appear in the scan — and the CSV/JSON round-trips
  * must preserve row counts exactly. */
class FormatsSpec extends SparkSpec {

  test("q56 re-read prunes to the single matching partition directory") {
    // drive the entry once so the partitioned copy exists
    assert(Formats.partitionedWrite(spark, sfDir).collect().nonEmpty)
    val out = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-q56-${graft.Scratch.procToken}",
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")).toString
    val all = spark.read.parquet(out)
    val statuses = all.select("o_orderstatus").distinct().count()
    assert(statuses == 3, s"expected 3 partition dirs, got $statuses")

    val pruned = all.filter(col("o_orderstatus") === "F")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.metadata.get("PartitionFilters").exists(_.contains("o_orderstatus")),
      s"partition filter missing: ${scan.metadata.get("PartitionFilters")}")
    // selected partitions strictly fewer than total: the F files only
    val selected = scan.selectedPartitions.partitionCount
    assert(selected == 1, s"expected 1 selected partition, got $selected")
  }

  test("csv and json round-trips preserve row counts") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(Formats.csvRoundtrip(spark, sfDir).agg(sum("n_orders")).head.getLong(0) == orders)
    val jsonTotal = Formats.jsonRoundtrip(spark, sfDir)
      .agg(sum("n_items")).head.getLong(0)
    val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_discount") >= 0.05).count()
    assert(jsonTotal == expected)
  }
}
