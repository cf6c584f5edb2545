package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, Dedup, Formats, GoldenOracles, IcebergQueries, Lakehouse, LakehouseExec, LakehouseInspect, LakehouseMaint, LakehouseNested, Multimodal, Relational, Relational2, Relational3, Similarity, StoragePartitioned, TextPipeline}
import graft.streaming.EventStreams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to functions of
  * (session, testdata dir) → DataFrame; `oracleSql` holds the DuckDB
  * equivalent for the driver's correctness gate. Column names and ordering
  * are part of the contract: both sides alias identically and ORDER BY the
  * same unique keys.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ IcebergQueries.queries ++ Dedup.queries ++
      TextPipeline.queries ++ Similarity.queries ++ Multimodal.queries ++
      EventStreams.queries ++ Advanced.queries ++ Relational2.queries ++
      Relational3.queries ++ Lakehouse.queries ++ LakehouseExec.queries ++
      LakehouseMaint.queries ++ LakehouseNested.queries ++
      LakehouseInspect.queries ++ Formats.queries ++ StoragePartitioned.queries

  /** Recompute oracles only — DuckDB SQL that re-derives each result from
    * the raw testdata tables. Entries whose golden VALUES pin is sf0.01-
    * specific fall back to these at other scales (graft.Verify). */
  def recomputeOracles: Map[String, String] =
    Relational.oracles ++ Dedup.oracles ++ TextPipeline.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++
      EventStreams.oracles ++ Advanced.oracles ++
      Relational2.oracles ++ Relational3.oracles ++ Lakehouse.oracles ++
      LakehouseExec.oracles ++ LakehouseMaint.oracles ++
      LakehouseNested.oracles ++ LakehouseInspect.oracles ++
      Formats.oracles ++ StoragePartitioned.oracles

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. Golden
    * VALUES oracles override the recompute where both exist. */
  def oracleSql: Map[String, String] =
    recomputeOracles ++ GoldenOracles.oracles
}
