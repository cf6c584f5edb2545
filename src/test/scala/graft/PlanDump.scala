package graft

/** Dev utility (test scope): dumps `.explain("formatted")` for one
  * representative query per family into PLANS.md — the plan-audit
  * evidence that each family's physical shape is the one we claim
  * (pushdown on scans, broadcasts on dims, banded equi-joins, partial
  * top-k, bucket joins). Run: `sbt "Test/runMain graft.PlanDump"`. */
object PlanDump {

  private val picks: Seq[(String, String)] = Seq(
    "q02_filter_revenue" -> "filter + aggregate: predicate/ReadSchema pushed to the parquet scan",
    "q03_join_topk" -> "dim joins broadcast; top-k compiles to TakeOrderedAndProject",
    "q26_salted_agg" -> "two-phase salted aggregation (skew-safe shape)",
    "q44_range_join" -> "banded range join: equi-join on (user_id, band), no nested loop",
    "q45_lateral_topk" -> "correlated LATERAL decorrelated to a ranked window join",
    "q51_topk_per_key" -> "custom TopKPerKey: partial bounded heaps BELOW the exchange",
    "d03_minhash_dedup" -> "LSH banding: band-key self-join + candidate-only verify joins",
    "d08_bloom_prefilter" -> "bloom scalar-subquery prefilter ahead of the exact semi join",
    "s02_ann_lsh" -> "multi-probe LSH: hashed corpus joined to broadcast query probes",
    "i03_pruned_scan" -> "DSv2 stats pruning: PushedFilters + planning-time partition drop",
    "t08_top_words" -> "two-shuffle corpus rollup ending in TakeOrderedAndProject",
    "q47_quartiles" -> "exact percentile aggregation (bounded group cardinality)",
    "i13_position_deletes" -> "MOR position deletes: broadcast hash anti-join on (_metadata.file_path, row_index); fact scan never shuffled",
    "d11_dup_passages" -> "passage contamination: codegen'd rolling shingle kernel in the scan stage; hashes, not strings, shuffle",
    "q56_partitioned_write" -> "partition-pruned re-read: PartitionFilters select one directory",
    "s03_kmeans_assign" -> "k-means assignment: broadcast centroids, corpus scanned once",
    "q37_balance_deciles" -> "distributed NTILE: range-partitioned rank + broadcast offsets, no single-partition window over the fact table",
    "d06_embedding_neardup" -> "bounded-block exact verify: broadcast per-block counts guard (raise_error) ahead of the within-block pair join",
    "q54_csv_roundtrip" -> "CSV re-read: explicit schema (no inference job), rollup over the text scan",
    "q55_json_roundtrip" -> "JSONL re-read: explicit schema, filter evaluated on the scan output",
    "q58_bucketed_join" -> "bucketed fact-fact join: both sides read bucketed, no Exchange before the join at scale (broadcast may win at this sf)",
    "st07_transform_with_state" -> "transformWithState read-back: the post-drive rollup over the memory sink (the streaming exec itself runs on RocksDB state, 4 store partitions)",
    "st08_stream_static_join" -> "stream-static join read-back: broadcast dimension joined inside the micro-batch, rollup after the drive",
    "q59_supplier_variety" -> "Q16 shape: broadcast anti-join exclusion, broadcast dim join, two-phase partial-distinct aggregation, TakeOrderedAndProject",
    "q60_order_gaps" -> "LAG per-key window: hash shuffle on the key, sort within partitions, no global stage",
    "i21_compaction_exec" -> "compaction executed: per-snapshot reconciliation of manifest stats vs a fresh distributed scan of the committed files (the rewrite itself already ran and committed)",
    "i22_delete_dml" -> "DELETE DML merge-on-read: position-delete parquet (written by the DML) anti-joined on (_metadata.file_path, row_index); delete side broadcast from AQE stats",
    "i28_mor_dml" -> "full v2 MOR: position AND equality delete files layered as two broadcast anti-joins over one unshuffled data scan",
    "i36_seq_scoped_scan" -> "sequence-scoped MOR: per-commit file groups carry their data sequence number as a scan constant; the equality delete applies through a strict-inequality anti-join, so later appends pass untouched",
    "i37_transform_pruned_scan" -> "hidden-partition pruning: planning converted the key predicate to murmur3-bucket space and opened 1 of 4 manifests; the plan is the residual filter over the single surviving bucket file",
    "i38_changelog_scan" -> "CDC changelog: insert stream scans only snapshot-added files; delete stream materializes rows via an inner join of delete (file,pos) addresses against the pre-delete file set (broadcast from AQE stats)",
    "st12_stream_compaction" -> "streamed-table compaction read-back: one compacted file scanned, rollup after the replace commit (the rewrite + CAS commit already ran)",
    "i41_merge_api" -> "public-API COW merge read-back: the composed GraftTable.read over the post-merge table — ONE data scan with the broadcast file→sequence lookup attaching _seq, carried delete manifests applying only to untouched files",
    "i43_partitioned_write" -> "API-written hidden partitioning: residual key filter over the single bucket file readWhere's transform-space pruning left (3 of 4 manifests never opened)",
    "i39_table_read" -> "the one-call table read, O(1)-scan shape: ONE data scan over all sequence groups (broadcast file→sequence lookup), one position-delete anti-join, one equality-delete anti-join per distinct column set — plan width flat in snapshot count",
    "i45_pruned_mor_read" -> "pruned read composed with MOR: transform-space pruning opened 1 of 4 manifests per key, and the surviving scan still anti-joins the sequence-scoped position deletes — the deleted key's partition scans and returns nothing",
    "i47_dsv2_table_read" -> "DSv2 graft-table scan: position deletes applied INSIDE the partition readers (task-local MOR) — the plan is a bare BatchScan + aggregate, NO delete join anywhere",
    "i48_dsv2_table_pruned" -> "Catalyst-pushed equality through the DSv2 table source: PushedFilters visible on the scan, manifests pruned in bucket-transform space at planning (the pruned ones are garbage on disk — reading proves they never open); the clean scan decodes COLUMNAR (ColumnarToRow above the BatchScan — round 9's vectorized route)",
    "i56_sql_decimal" -> "DECIMAL through the SQL catalog: the money filter pushes to the graft-table scan, decimal bound stats prune at planning, and the clean scan takes the vectorized columnar route",
    "st14_stream_table_read" -> "streaming READ of a graft table (post-drive rollup over the file sink): the stream itself planned one micro-batch per snapshot (max-snapshots-per-trigger=1), each batch a bare BatchScan over exactly that snapshot's added files",
    "i53_sql_lifecycle" -> "plain SQL over the GraftCatalog: the SELECT aggregate plans as the same bare BatchScan + two-phase agg as the programmatic route — DELETE already applied as position-delete MOR inside the readers, no join",
    "i85_deletion_vectors" -> "v3 deletion vectors: after DELETE and rewrite the aggregate plans as a bare BatchScan + two-phase agg — the DV bitmaps apply INSIDE the partition readers (one blob read per file, unboxed probe per row), never as a join",
    "i86_zorder_rewrite" -> "emitted record: a LocalRelation pinning the row the in-entry gate ALREADY verified against the source (the entry materializes its post-zorder aggregate once and gates it — no second ungated execution reaches the oracle). The real post-zorder scan is the same bare columnar BatchScan as i85's; the curve's payoff is at PLANNING (bound-stat pruning on every clustered column — ZOrderSpec pins it destructively), not in the plan shape",
    "i87_variant_columns" -> "VARIANT scan: variant_get extractions evaluate over the row-route BatchScan (variant is outside the vectorized palette by design); aggregation is the standard two-phase shape",
    "i88_row_lineage" -> "row lineage read: _row_id/_last_updated_sequence_number are reader-served metadata columns — the plan is the bare row-route BatchScan + aggregate, no lineage join anywhere",
    "i91_timestamp_ns" -> "v3 nanosecond timestamps: the ns columns scan as plain longs (NANOS-annotated parquet under nanosAsLong), the selective ns predicate prunes on the LE-long-nanos bound stats at planning, and the surviving scan is the bare columnar BatchScan + two-phase agg",
    "i93_changelog_updates" -> "changelog compute-updates: ONE window over (identifier, ordinal) pairs delete+insert into update images and drops carry-overs — a single keyed shuffle over the changelog union, the same partitioning a downstream upsert sink needs; no driver-side pass",
    "i94_format_default" -> "format-default writes read back: one scan spans native-avro, imported-avro and native-orc entries through per-format partition readers — the plan is a bare BatchScan + rollup, format dispatch invisible above the reader factory",
    "m05_wav_decode" -> "real WAV decode: encode+decode run inside the partition iterator (DeserializeToObject → MapPartitions → SerializeFromObject), the only shuffle is the final global rollup — the shape that keeps a 100 TB media decode embarrassingly parallel",
    "i95_geometry_points" -> "WKB point kernels: graft_st_x/graft_st_y evaluate inside WholeStageCodegen over the bare columnar BatchScan of the geometry table — static-call expressions, no UDF boundary",
    "t17_decontamination" -> "benchmark decontamination: the eval set's distinct gram hashes BROADCAST into the corpus's positional gram stream (13-gram hashing inside the scan via the rolling kernel); the only hash shuffle is the per-doc rollup over the contaminated subset",
    "t18_contamination_removal" -> "contamination removal: the same broadcast gram join, then span expansion + distinct + both rollups run on the contaminated subset only — the corpus itself is scanned once and never shuffled",
    "s05_ivf_pq" -> "IVF-PQ: the pre-coded corpus (cell id + 4 PQ codes from one scan) joins the broadcast probe list through a HASH equi-join on cell id — s04's BroadcastNestedLoop cross-product is gone; only probed cells' members are ever ADC-scored",
    "q61_late_suppliers" -> "Q21 shape: both existence probes (semi + anti) ride the l_orderkey equi-join with the supplier inequality as a residual — no nested loop; the supplier dimension broadcasts; the late flag derives once and feeds both probes",
    "s07_kmeans_train" -> "k-means training read-back: the final assignment — centroids as broadcast LITERALS (no join at all), first-min distance in one projection, two-phase rollup; each training iteration before it was one corpus scan + one k×dim-group partial-aggregated shuffle of fixed-point INTEGER sums (order-independent, partitioning-immune), only KB of sums ever reaching the driver",
    "i62_sql_wap" -> "SQL WAP incl. branch-scoped MERGE/UPDATE: the post-publish rollup over the fast-forwarded table — the staged row-level edits planned against the BRANCH head and committed only to the branch ref, so the published read is the same bare BatchScan + two-phase agg as any other table scan")

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-plandump", cores = "4")
    val dir = "/root/testdata/sf0.01"
    val out = new StringBuilder
    out ++= "# PLANS — physical plans of representative queries (sf0.01, local[4])\n\n"
    out ++= "Generated by `sbt \"Test/runMain graft.PlanDump\"`; one representative\n"
    out ++= "per family, with the scale property the plan is meant to exhibit.\n"
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, dir)
      // materialize first so AQE finalizes: runtime decisions (broadcast
      // from stats, skew splits, stage reuse) are part of the evidence
      df.collect()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      out ++= s"\n## $name\n\n$why\n\n```\n$formatted```\n"
    }
    // the orphan sweep's anti-join (not an entry's OUTPUT shape — the
    // sweep's own internal plan, dumped from a throwaway table): referenced
    // paths stream from the graft-manifest DSv2 scan, the data-dir listing
    // streams executor-side, and the difference is a LEFT ANTI join — the
    // r19-verdict fix replacing the driver-side full-file-inventory Set
    locally {
      val dir = java.nio.file.Files.createTempDirectory("graft-plandump-orphan")
        .toString + "/t"
      graft.iceberg.GraftTable.create(dir,
        graft.iceberg.IcebergSchema(0, Seq(
          graft.iceberg.IcebergField(1, "k", required = false, "int"))),
        tableUuid = "b6b9a6a1-0000-4000-8000-0000000000aa",
        timestampMs = 1700000000000L)
      import spark.implicits._
      graft.iceberg.GraftTable.append(spark, dir, Seq(1, 2, 3).toDF("k").coalesce(1))
      val cands = graft.iceberg.GraftTable.orphanFileCandidates(spark, dir)
      cands.collect()
      val formatted = cands.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      out ++= s"\n## remove_orphan_files candidate set (internal plan)\n\n" +
        "distributed orphan sweep: graft-manifest DSv2 scan (referenced) " +
        "LEFT ANTI joined to the executor-streamed data-dir listing; " +
        "deletes then run per-partition on the executors — no file-count-" +
        s"proportional driver state\n\n```\n$formatted```\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), out.toString)
    println(s"[plandump] wrote PLANS.md (${picks.size + 1} plans)")
    spark.stop()
  }
}
