package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.iceberg._

/** The st16 LSN-guard contract, isolated from the streaming harness: a
  * guarded equality-delete upsert sink must converge to the max-lsn row
  * per key under ANY batch order, and a replayed batch must commit
  * nothing (natural idempotence — no batch-id bookkeeping). */
class UpsertStreamSpec extends SparkSpec {

  private def mkTable(tag: Char): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-upsert-$tag").toString
    val sub = s"$dir/t"
    GraftTable.create(sub, IcebergSchema(0, Seq(
      IcebergField(1, "user_id", required = false, "long"),
      IcebergField(2, "lsn", required = false, "long"),
      IcebergField(3, "v", required = false, "string"))),
      tableUuid = s"b6b9a6a1-0000-4000-8000-0000000016e$tag",
      timestampMs = 1700000000000L)
    sub
  }

  /** The st16 foreachBatch body: reduce to latest-per-key, drop rows the
    * table already supersedes, upsert what's left. Returns true iff a
    * snapshot was committed. */
  private def guardedUpsert(out: String, rows: Seq[(Long, Long, String)]): Boolean = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val wK = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"lsn".desc)
    val latest = rows.toDF("user_id", "lsn", "v")
      .withColumn("rn", row_number().over(wK)).filter($"rn" === 1).drop("rn")
    val metaNow = TableMetadata.parseFile(GraftTable.latestMetadataPath(out))
    val cur: DataFrame =
      if (metaNow.currentSnapshot.isEmpty)
        Seq.empty[(Long, Long)].toDF("user_id", "cur_lsn")
      else GraftTable.read(spark, GraftTable.latestMetadataPath(out))
        .select($"user_id", $"lsn".as("cur_lsn"))
    val fresh = latest.join(cur, Seq("user_id"), "left_outer")
      .filter($"cur_lsn".isNull || $"lsn" > $"cur_lsn").drop("cur_lsn")
    if (fresh.limit(1).count() > 0) {
      GraftTable.upsert(spark, out, fresh, Seq("user_id")); true
    } else false
  }

  private def state(out: String): Set[(Long, Long, String)] =
    GraftTable.read(spark, GraftTable.latestMetadataPath(out))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  private val batchA = Seq((1L, 10L, "a10"), (2L, 20L, "a20"))
  private val batchB = Seq((1L, 5L, "stale"), (2L, 30L, "b30"), (3L, 7L, "b7"))
  private val converged = Set((1L, 10L, "a10"), (2L, 30L, "b30"), (3L, 7L, "b7"))

  test("guarded upsert converges to max-lsn per key; replay commits nothing") {
    val out = mkTable('a')
    assert(guardedUpsert(out, batchA))
    assert(guardedUpsert(out, batchB)) // k1's lsn-5 row must NOT regress k1
    assert(!guardedUpsert(out, batchA), "a replayed batch must filter to nothing")
    assert(state(out) == converged)
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(out))
    assert(meta.snapshots.size == 2, "the replay must not have committed")
    val head = meta.currentSnapshot.get
    assert(head.summary.get("added-equality-deletes").exists(_.toLong > 0),
      s"upsert head must carry equality deletes: ${head.summary}")
  }

  test("batch order does not change the final state") {
    val out = mkTable('b')
    assert(guardedUpsert(out, batchB)) // out-of-order arrival: B first
    assert(guardedUpsert(out, batchA)) // k1 lsn-10 beats B's lsn-5
    assert(state(out) == converged)
  }
}
