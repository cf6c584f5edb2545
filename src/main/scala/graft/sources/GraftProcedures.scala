package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.iceberg.{GraftTable, ManifestListReader, ManifestWriter,
  TableMetadata}

/** SQL maintenance procedures on the DSv2 procedure API (Spark 4's
  * `ProcedureCatalog`/`BoundProcedure`) — the surface Iceberg exposes as
  * `CALL catalog.system.<proc>(...)`:
  *
  * {{{
  *   CALL graft.system.rewrite_data_files(table => 'db.t')
  *   CALL graft.system.expire_snapshots('db.t', 2)
  *   CALL graft.system.rollback_to_snapshot('db.t', 3)
  *   CALL graft.system.create_tag('db.t', 'v1')
  *   CALL graft.system.fast_forward('db.t', 'audit')
  * }}}
  *
  * Each lands on the programmatic machinery (compact / expireSnapshots /
  * rollbackTo / createTag / fastForward — all CAS commits), and each
  * returns one summary row served as a `LocalScan` (driver-scale results,
  * no tasks — the same boundary the metadata tables keep). Table
  * arguments are catalog-relative names (`'db.t'`), resolved by the
  * owning catalog's directory mapping. */
object GraftProcedures {

  /** Bound-and-unbound in one: the graft procedures take no overloads,
    * so binding is the identity and parameters are static. */
  private final class Proc(
      procName: String,
      procDescription: String,
      params: Array[ProcedureParameter],
      out: StructType,
      body: InternalRow => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDescription
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val resultRows = body(input).toArray
      util.Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = resultRows
        override def readSchema(): StructType = out
        override def description(): String = s"graft procedure $procName result"
      }).iterator()
    }
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** Live data-file count of the current snapshot — KB-scale manifest
    * reads, used for the procedures' before/after summary rows. */
  private def dataFileCount(meta: TableMetadata): Int =
    meta.currentSnapshot.flatMap(_.manifestList).toSeq
      .flatMap(ManifestListReader.read).filter(_.content == 0)
      .flatMap(i => ManifestWriter.read(i.path))
      .count(e => e.status != 2 && e.content == 0)

  private def currentMeta(dir: String): TableMetadata =
    TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))

  def names: Seq[String] = Seq("rewrite_data_files", "expire_snapshots",
    "rollback_to_snapshot", "create_tag", "fast_forward",
    "rewrite_manifests", "remove_orphan_files", "create_branch",
    "rewrite_position_delete_files", "cherrypick_snapshot", "add_files",
    "drop_tag", "drop_branch", "snapshot", "migrate",
    "rollback_to_timestamp", "create_changelog_view", "ancestors_of",
    "compute_table_stats", "compute_partition_stats", "register_table",
    "delete_reachable_files", "set_current_snapshot", "publish_changes")

  /** `resolveDir` maps a catalog-relative table name (`db.t`) to its
    * table directory — supplied by the owning catalog. `resolveNewDir`
    * is the existence-unchecked variant for procedures that CREATE
    * their target (`snapshot`). */
  def load(procName: String, resolveDir: String => String,
      resolveNewDir: String => String = identity): Option[UnboundProcedure] = {
    def dirOf(input: InternalRow): String =
      resolveDir(input.getUTF8String(0).toString)
    Some(procName).collect {
      case "rewrite_data_files" => new Proc(
        "rewrite_data_files",
        "rewrite the table's data files toward target_file_size_bytes, " +
          "materializing pending deletes; one CAS replace snapshot. " +
          "strategy 'binpack' (default) groups files by size; " +
          "strategy 'sort' clusters by sort_order — a column list " +
          "('a DESC, b') for a linear sort with disjoint per-file " +
          "ranges, or 'zorder(a, b)' for Morton-curve clustering whose " +
          "files cover small hyper-rectangles (min/max pruning works " +
          "for ANY clustered column subset). `where` restricts the " +
          "rewrite to files whose bound stats may match (ANDed " +
          "comparisons of top-level columns against literals) — " +
          "selected files rewrite wholly, everything else carries " +
          "verbatim with its manifests. min_input_files (default 1 = " +
          "always rewrite) no-ops when fewer files match — the " +
          "idempotent-sweep threshold",
        Array(in("table", StringType),
          inDefault("target_file_size_bytes", LongType, (512L * 1024 * 1024).toString),
          inDefault("strategy", StringType, "'binpack'"),
          inDefault("sort_order", StringType, "''"),
          inDefault("where", StringType, "''"),
          inDefault("min_input_files", IntegerType, "1")),
        StructType(Seq(
          StructField("rewritten_data_files_count", IntegerType),
          StructField("added_data_files_count", IntegerType),
          StructField("snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          // EVERY defaultable argument treats an explicit NULL as "use
          // the default" — one consistent rule, never an NPE (and never
          // a targetBytes=0 division artifact)
          val targetBytes =
            if (input.isNullAt(1)) 512L * 1024 * 1024 else input.getLong(1)
          val strategy = if (input.isNullAt(2)) "binpack" else input.getString(2)
          val orderSpec = if (input.isNullAt(3)) "" else input.getString(3).trim
          val ZOrderRe = """(?i)zorder\s*\(([^)]*)\)""".r
          val (sortCols, zCols) = strategy.toLowerCase match {
            case "binpack" =>
              require(orderSpec.isEmpty, "binpack takes no sort_order")
              (Nil, Nil)
            case "sort" => orderSpec match {
              case ZOrderRe(inner) =>
                val cs = inner.split(",").map(_.trim).filter(_.nonEmpty).toSeq
                require(cs.nonEmpty, "zorder() needs at least one column")
                (Nil, cs)
              case "" => throw new IllegalArgumentException(
                "strategy 'sort' needs sort_order")
              case cols => (cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
                .map { spec =>
                  val toks = spec.split("\\s+").toSeq
                  (toks.head, toks.tail.exists(_.equalsIgnoreCase("DESC")))
                }, Nil)
            }
            case other => throw new IllegalArgumentException(
              s"unknown strategy '$other' — binpack or sort")
          }
          // explicit NULL arguments mean "default", exactly like absence
          // (the sibling snapshot_ids NULL guard) — never an NPE
          val whereArg =
            if (input.isNullAt(4)) None
            else Some(input.getString(4).trim).filter(_.nonEmpty)
          val minInput = if (input.isNullAt(5)) 1 else input.getInt(5)
          val result = GraftTable.compact(SparkSession.active, dir,
            targetBytes = targetBytes, sortOrder = sortCols,
            zorderCols = zCols, where = whereArg, minInputFiles = minInput)
          // upstream-parity counts: files ACTUALLY rewritten/added — a
          // partial (where => ...) rewrite of 1-of-3 files reports
          // (1, 1), not table totals. attempts == 0 is compact's no-op
          // signal (empty selection or below min_input_files: no
          // metadata version written) → (0, 0); otherwise the fresh
          // replace snapshot's summary carries the exact counts.
          val summary =
            if (result.attempts == 0) Map.empty[String, String]
            else result.metadata.currentSnapshot.map(_.summary)
              .getOrElse(Map.empty[String, String])
          Seq(InternalRow(
            summary.get("deleted-data-files").map(_.toInt).getOrElse(0),
            summary.get("added-data-files").map(_.toInt).getOrElse(0),
            result.metadata.currentSnapshotId.getOrElse(0L)))
        })
      case "add_files" => new Proc(
        "add_files",
        "import an existing directory of parquet/orc (footer stats, " +
          "zero data bytes) or avro (block record counts) files as one " +
          "append snapshot — files referenced in place, no copy",
        Array(in("table", StringType), in("source_dir", StringType),
          inDefault("format", StringType, "'parquet'")),
        StructType(Seq(
          StructField("added_files_count", IntegerType),
          StructField("added_records_count", LongType),
          StructField("snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          val before = dataFileCount(currentMeta(dir))
          val result = GraftTable.addFiles(SparkSession.active, dir,
            input.getUTF8String(1).toString,
            format = input.getUTF8String(2).toString)
          val meta = currentMeta(dir)
          val added = dataFileCount(meta) - before
          val newSnap = result.metadata.currentSnapshotId.getOrElse(-1L)
          val records = meta.currentSnapshot.flatMap(_.manifestList).toSeq
            .flatMap(ManifestListReader.read).filter(_.content == 0)
            .flatMap(i => ManifestWriter.read(i.path))
            .filter(e => e.status == 1 && e.content == 0 && e.snapshotId == newSnap)
            .map(_.recordCount).sum
          Seq(InternalRow(added, records,
            result.metadata.currentSnapshotId.getOrElse(0L)))
        })
      case "cherrypick_snapshot" => new Proc(
        "cherrypick_snapshot",
        "re-apply one staged APPEND snapshot's added files onto main as a " +
          "new commit — the publish path when main advanced past the fork " +
          "and fast_forward refuses",
        Array(in("table", StringType), in("snapshot_id", LongType)),
        StructType(Seq(
          StructField("source_snapshot_id", LongType),
          StructField("current_snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          val src = input.getLong(1)
          val result = GraftTable.cherrypick(dir, src)
          Seq(InternalRow(src, result.metadata.currentSnapshotId.getOrElse(0L)))
        })
      case "rewrite_position_delete_files" => new Proc(
        "rewrite_position_delete_files",
        "resolve pending equality deletes to position deletes and compact " +
          "all delete files into one — restores cheap MOR reads; " +
          "data files untouched",
        Array(in("table", StringType)),
        StructType(Seq(
          StructField("rewritten_delete_files_count", IntegerType),
          StructField("added_delete_files_count", IntegerType),
          StructField("snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          def delCount(meta: TableMetadata): Int =
            meta.currentSnapshot.flatMap(_.manifestList).toSeq
              .flatMap(ManifestListReader.read).filter(_.content == 1)
              .flatMap(i => ManifestWriter.read(i.path))
              .count(e => e.status != 2 && e.content != 0)
          val before = delCount(currentMeta(dir))
          val result = GraftTable.rewritePositionDeleteFiles(SparkSession.active, dir)
          Seq(InternalRow(before, delCount(result.metadata),
            result.metadata.currentSnapshotId.getOrElse(0L)))
        })
      case "expire_snapshots" => new Proc(
        "expire_snapshots",
        "drop expired snapshots and physically delete every artifact " +
          "reachable only from them; older_than_ms expires by commit age " +
          "(the newest retain_last always survive), snapshot_ids expires " +
          "exactly the named snapshots (pin rules only — current/" +
          "ref-pinned refuse; the targeted reclamation of an abandoned " +
          "stage), otherwise all but the last retain_last expire",
        Array(in("table", StringType),
          inDefault("retain_last", IntegerType, "1"),
          // -1 = unset (the scheduler-friendly age policy is opt-in;
          // epoch millis keeps the argument type oracle-checkable)
          inDefault("older_than_ms", LongType, "-1"),
          inDefault("snapshot_ids", ArrayType(LongType), "NULL")),
        StructType(Seq(
          StructField("expired_snapshots_count", IntegerType),
          StructField("retained_snapshots_count", IntegerType))),
        input => {
          val dir = dirOf(input)
          val before = currentMeta(dir).snapshots.size
          val olderThan = Some(input.getLong(2)).filter(_ >= 0)
          // an EXPLICIT empty array must not quietly degrade into the
          // retain_last=1 retention sweep ("expire these zero
          // snapshots" → table-wide history purge); null elements must
          // not silently read as snapshot id 0
          val ids = if (input.isNullAt(3)) Nil
            else {
              val arr = input.getArray(3)
              require(arr.numElements() > 0, "snapshot_ids is empty — " +
                "nothing to expire; omit the argument for " +
                "retention-policy expiry")
              (0 until arr.numElements()).map { i =>
                require(!arr.isNullAt(i), "snapshot_ids contains NULL")
                arr.getLong(i)
              }
            }
          val result = GraftTable.expireSnapshots(SparkSession.active, dir,
            keepLast = input.getInt(1), olderThanMs = olderThan,
            snapshotIds = ids)
          val after = result.metadata.snapshots.size
          Seq(InternalRow(before - after, after))
        })
      case "compute_table_stats" => new Proc(
        "compute_table_stats",
        "one-pass ANALYZE of the current snapshot: per-column NDV " +
          "(theta sketch) + exact null counts + exact row count, " +
          "committed as a statistics file (the Puffin slot) that the " +
          "scan serves back to Spark's CBO as column statistics. With " +
          "incremental => true and a chain of only appends and replaces " +
          "(compaction rewrites the files, not the rowset) since the " +
          "last analyzed ancestor, only the files the appends added are " +
          "scanned and their sketches unioned with the previous " +
          "document's standard theta blobs (mode column reports which " +
          "path ran)",
        Array(in("table", StringType),
          inDefault("incremental", BooleanType, "false"),
          inDefault("snapshot_id", LongType, "NULL"),
          inDefault("columns", ArrayType(StringType), "NULL")),
        StructType(Seq(
          StructField("snapshot_id", LongType),
          StructField("row_count", LongType),
          StructField("analyzed_columns_count", IntegerType),
          StructField("statistics_path", StringType),
          StructField("mode", StringType))),
        input => {
          val snapId = if (input.isNullAt(2)) None else Some(input.getLong(2))
          val cols = if (input.isNullAt(3)) None
            else Some(input.getArray(3).toObjectArray(StringType)
              .map(_.asInstanceOf[UTF8String].toString).toSeq)
          val (result, doc, wasIncremental) =
            if (input.getBoolean(1)) {
              require(snapId.isEmpty && cols.isEmpty,
                "incremental analyzes the current snapshot over the full " +
                  "sketchable column set — it combines with neither " +
                  "snapshot_id nor columns")
              GraftTable.computeTableStatsIncremental(
                SparkSession.active, dirOf(input))
            } else {
              val (r, d) = GraftTable.computeTableStats(
                SparkSession.active, dirOf(input), snapId, cols)
              (r, d, false)
            }
          val path = result.metadata.statistics
            .find(_.snapshotId == doc.snapshotId).map(_.path).getOrElse("")
          Seq(InternalRow(doc.snapshotId, doc.rowCount, doc.columns.size,
            UTF8String.fromString(path),
            UTF8String.fromString(if (wasIncremental) "incremental" else "full")))
        })
      case "compute_partition_stats" => new Proc(
        "compute_partition_stats",
        "per-partition rollup (data/delete record, file, byte counts) " +
          "from the current snapshot's manifests — zero data bytes — " +
          "registered in the partition-statistics slot; the partitions " +
          "metadata table then serves from the file with zero manifest opens",
        Array(in("table", StringType)),
        StructType(Seq(
          StructField("snapshot_id", LongType),
          StructField("partitions_count", LongType),
          StructField("statistics_path", StringType))),
        input => {
          val dir = dirOf(input)
          val (result, nParts) =
            GraftTable.computePartitionStats(SparkSession.active, dir)
          val snapId = result.metadata.currentSnapshotId.getOrElse(0L)
          val path = result.metadata.partitionStatistics
            .find(_.snapshotId == snapId).map(_.path).getOrElse("")
          Seq(InternalRow(snapId, nParts, UTF8String.fromString(path)))
        })
      case "ancestors_of" => new Proc(
        "ancestors_of",
        "the parent chain of a snapshot (default: current head), newest " +
          "first — the ancestry every time-travel/changelog/cherry-pick " +
          "decision walks",
        Array(in("table", StringType),
          inDefault("snapshot_id", LongType, "NULL")),
        StructType(Seq(
          StructField("snapshot_id", LongType),
          StructField("timestamp_ms", LongType))),
        input => {
          val meta = currentMeta(dirOf(input))
          val startId =
            (if (input.isNullAt(1)) meta.currentSnapshotId else Some(input.getLong(1)))
              .getOrElse(throw new IllegalArgumentException("table has no snapshot"))
          val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          var cur = Some(meta.snapshot(startId).getOrElse(
            throw new IllegalArgumentException(s"snapshot $startId not found")))
            : Option[graft.iceberg.Snapshot]
          while (cur.isDefined) {
            out += InternalRow(cur.get.snapshotId, cur.get.timestampMs)
            cur = cur.get.parentSnapshotId.flatMap(meta.snapshot)
          }
          out.toSeq
        })
      case "create_changelog_view" => new Proc(
        "create_changelog_view",
        "register a temp view over the table's CDC changelog for a " +
          "snapshot range (start exclusive, end inclusive; defaults: " +
          "whole history to current head): one row per logically " +
          "inserted/deleted row tagged _change_type / _change_ordinal / " +
          "_commit_snapshot_id; replace (compaction/rewrite) snapshots " +
          "emit nothing. identifier_columns (comma-separated) switches " +
          "on compute-updates: a same-commit delete+insert pair sharing " +
          "identifier values becomes update_before/update_after, and an " +
          "identical pair (carry-over from a rewrite) is dropped",
        Array(in("table", StringType),
          inDefault("changelog_view", StringType, "NULL"),
          inDefault("start_snapshot_id", LongType, "NULL"),
          inDefault("end_snapshot_id", LongType, "NULL"),
          inDefault("identifier_columns", StringType, "NULL")),
        StructType(Seq(StructField("changelog_view", StringType))),
        input => {
          val tableName = input.getUTF8String(0).toString
          val dir = resolveDir(tableName)
          val view =
            if (input.isNullAt(1)) s"${tableName.split('.').last}_changes"
            else input.getUTF8String(1).toString
          val start = if (input.isNullAt(2)) None else Some(input.getLong(2))
          val end = if (input.isNullAt(3)) None else Some(input.getLong(3))
          val idCols =
            if (input.isNullAt(4)) Nil
            else {
              val cs = input.getUTF8String(4).toString
                .split(",").map(_.trim).filter(_.nonEmpty).toSeq
              // '' or ', ,' must refuse, not silently fall back to the
              // raw changelog a pairing-expectant CDC consumer can't use
              require(cs.nonEmpty,
                "identifier_columns must name at least one column")
              cs
            }
          val df =
            if (idCols.isEmpty)
              GraftTable.changelog(SparkSession.active, dir, start, end)
            else GraftTable.changelogWithUpdates(
              SparkSession.active, dir, start, end, idCols)
          df.createOrReplaceTempView(view)
          Seq(InternalRow(UTF8String.fromString(view)))
        })
      case "rollback_to_timestamp" => new Proc(
        "rollback_to_timestamp",
        "move main back to the latest ANCESTOR snapshot committed at or " +
          "before the given epoch-millis instant (Iceberg resolves along " +
          "the current lineage, not the raw snapshot log — a post-rollback " +
          "log entry can point at a detached head); pointer move only — " +
          "expiry reclaims files",
        Array(in("table", StringType), in("timestamp_ms", LongType)),
        StructType(Seq(
          StructField("previous_snapshot_id", LongType),
          StructField("current_snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          val ts = input.getLong(1)
          val meta = currentMeta(dir)
          val previous = meta.currentSnapshotId.getOrElse(0L)
          val target = meta.lineage().flatMap(meta.snapshot)
            .filter(_.timestampMs <= ts)
            .maxByOption(_.timestampMs).map(_.snapshotId).getOrElse(
              throw new IllegalArgumentException(
                s"no ancestor snapshot was committed at or before $ts"))
          val result = GraftTable.rollbackTo(dir, target)
          Seq(InternalRow(previous, result.metadata.currentSnapshotId.getOrElse(0L)))
        })
      case "publish_changes" => new Proc(
        "publish_changes",
        "publish the STAGED snapshot carrying the given wap.id (the " +
          "spark.wap.id write-audit-publish flavor): fast-forwards main " +
          "onto it when main never moved since the stage (id preserved, " +
          "zero manifest work), else cherry-picks its manifests onto the " +
          "advanced head",
        Array(in("table", StringType), in("wap_id", StringType)),
        StructType(Seq(
          StructField("staged_snapshot_id", LongType),
          StructField("current_snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          val wapId = input.getUTF8String(1).toString
          // candidate matching, the fast-forward-vs-cherry-pick decision
          // and the parent-is-still-head check all live INSIDE the CAS
          // closure (GraftTable.publishChanges) — a concurrent commit can
          // never be orphaned by a stale fast-forward
          val (stagedId, result) = GraftTable.publishChanges(dir, wapId)
          Seq(InternalRow(stagedId,
            result.metadata.currentSnapshotId.getOrElse(0L)))
        })
      case "set_current_snapshot" => new Proc(
        "set_current_snapshot",
        "move main to ANY existing snapshot — by id or by ref name " +
          "(resolved inside the CAS, so a concurrent ref move can't " +
          "publish a stale target), no ancestry requirement (redo after " +
          "a rollback, or publish a staged snapshot directly); pointer " +
          "move only; a target already current is a no-op success",
        Array(in("table", StringType),
          inDefault("snapshot_id", LongType, "NULL"),
          inDefault("ref", StringType, "NULL")),
        StructType(Seq(
          StructField("previous_snapshot_id", LongType),
          StructField("current_snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          val bySnap = if (input.isNullAt(1)) None else Some(input.getLong(1))
          val byRef = if (input.isNullAt(2)) None
            else Some(input.getUTF8String(2).toString)
          require(bySnap.isDefined != byRef.isDefined,
            "exactly one of snapshot_id and ref must be given")
          val previous = currentMeta(dir).currentSnapshotId.getOrElse(0L)
          val result = GraftTable.setCurrentSnapshotTo(dir,
            bySnap.toLeft(byRef.get))
          Seq(InternalRow(previous, result.metadata.currentSnapshotId.getOrElse(0L)))
        })
      case "rollback_to_snapshot" => new Proc(
        "rollback_to_snapshot",
        "move main back to an existing snapshot (pointer move only; " +
          "expiry reclaims files)",
        Array(in("table", StringType), in("snapshot_id", LongType)),
        StructType(Seq(
          StructField("previous_snapshot_id", LongType),
          StructField("current_snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          val previous = currentMeta(dir).currentSnapshotId.getOrElse(0L)
          val result = GraftTable.rollbackTo(dir, input.getLong(1))
          Seq(InternalRow(previous, result.metadata.currentSnapshotId.getOrElse(0L)))
        })
      case "create_tag" => new Proc(
        "create_tag",
        "tag a snapshot (default: the current head) for AS OF time travel",
        Array(in("table", StringType), in("tag", StringType),
          inDefault("snapshot_id", LongType, "NULL"),
          inDefault("max_ref_age_ms", LongType, "NULL")),
        StructType(Seq(
          StructField("tag", StringType),
          StructField("snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          val tag = input.getUTF8String(1).toString
          val snapId = if (input.isNullAt(2)) None else Some(input.getLong(2))
          val maxAge = if (input.isNullAt(3)) None else Some(input.getLong(3))
          val result = GraftTable.createTag(dir, tag, snapId, maxAge)
          val tagged = result.metadata.refs.find(_.name == tag).get.snapshotId
          Seq(InternalRow(UTF8String.fromString(tag), tagged))
        })
      case "migrate" => new Proc(
        "migrate",
        "convert a plain parquet directory under the warehouse into a " +
          "table IN PLACE: schema inferred from footers, files adopted " +
          "as one append snapshot with footer stats — no bytes move",
        Array(in("table", StringType)),
        StructType(Seq(
          StructField("migrated_files_count", IntegerType),
          StructField("migrated_records_count", LongType))),
        input => {
          val dir = resolveNewDir(input.getUTF8String(0).toString)
          val result = GraftTable.migrate(SparkSession.active, dir)
          val entries = result.metadata.currentSnapshot.flatMap(_.manifestList)
            .toSeq.flatMap(ManifestListReader.read).filter(_.content == 0)
            .flatMap(i => ManifestWriter.read(i.path))
            .filter(e => e.status != 2 && e.content == 0)
          Seq(InternalRow(entries.size, entries.map(_.recordCount).sum))
        })
      case "register_table" => new Proc(
        "register_table",
        "adopt an EXISTING table (its current metadata.json and all " +
          "history) into this catalog by reference — the fourth " +
          "onboarding path, after add_files/migrate/snapshot: nothing " +
          "is rewritten or moved, the catalog entry is a pointer file " +
          "and every operation (scans, DML, procedures) lands in the " +
          "original directory. DROP removes only the pointer; the " +
          "adopted table and its files survive",
        Array(in("table", StringType), in("metadata_file", StringType)),
        StructType(Seq(
          StructField("registered_location", StringType),
          StructField("current_snapshot_id", LongType),
          StructField("total_data_files", IntegerType))),
        input => {
          val layout = resolveNewDir(input.getUTF8String(0).toString)
          require(graft.iceberg.OptimisticCommit.currentVersion(layout) == 0 &&
              !graft.sources.GraftCatalog.isRegistered(layout),
            s"table already exists at $layout")
          val metaFile = input.getUTF8String(1).toString
          val slash = metaFile.lastIndexOf('/')
          require(slash > 0, s"metadata_file must be an absolute " +
            s"vN.metadata.json path, got $metaFile")
          val targetDir = metaFile.substring(0, slash)
          val v = graft.iceberg.OptimisticCommit.currentVersion(targetDir)
          require(v > 0, s"no table metadata under $targetDir")
          // the registered entry must track the directory's live history:
          // registering a SUPERSEDED metadata version would silently
          // serve a newer state than the caller named (our layout scans
          // the directory) — refuse instead of surprising
          require(graft.iceberg.OptimisticCommit.metadataPath(targetDir, v) == metaFile,
            s"$metaFile is not the directory's current metadata " +
              s"(${graft.iceberg.OptimisticCommit.metadataPath(targetDir, v)}) — " +
              "register the current version")
          val meta = currentMeta(targetDir)
          graft.sources.GraftCatalog.writePointer(layout, targetDir)
          Seq(InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(targetDir),
            meta.currentSnapshotId.getOrElse(-1L),
            dataFileCount(meta)))
        })
      case "snapshot" => new Proc(
        "snapshot",
        "zero-copy fork: create a new table referencing the source " +
          "table's current data files in place — no bytes move, stats " +
          "carry over; the fork gets gc.enabled=false so its cleanup " +
          "can never delete the source's files",
        Array(in("source_table", StringType), in("table", StringType)),
        StructType(Seq(
          StructField("imported_files_count", IntegerType),
          StructField("imported_records_count", LongType))),
        input => {
          val srcDir = resolveDir(input.getUTF8String(0).toString)
          val dstDir = resolveNewDir(input.getUTF8String(1).toString)
          val result = GraftTable.snapshotTable(srcDir, dstDir)
          val entries = result.metadata.currentSnapshot.flatMap(_.manifestList)
            .toSeq.flatMap(ManifestListReader.read).filter(_.content == 0)
            .flatMap(i => ManifestWriter.read(i.path))
            .filter(e => e.status != 2 && e.content == 0)
          Seq(InternalRow(entries.size, entries.map(_.recordCount).sum))
        })
      case "drop_tag" => new Proc(
        "drop_tag",
        "drop a tag ref — the snapshots it pinned become expirable " +
          "(the release valve when expire_snapshots aborts on a ref)",
        Array(in("table", StringType), in("tag", StringType)),
        StructType(Seq(
          StructField("dropped_ref", StringType),
          StructField("was_snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          val tag = input.getUTF8String(1).toString
          val was = currentMeta(dir).refs.find(_.name == tag).map(_.snapshotId)
          GraftTable.removeRef(dir, tag, expectedType = Some("tag"))
          Seq(InternalRow(UTF8String.fromString(tag), was.getOrElse(0L)))
        })
      case "drop_branch" => new Proc(
        "drop_branch",
        "drop a branch ref (e.g. a published or abandoned audit branch); " +
          "its staged snapshots become expirable",
        Array(in("table", StringType), in("branch", StringType)),
        StructType(Seq(
          StructField("dropped_ref", StringType),
          StructField("was_snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          val branch = input.getUTF8String(1).toString
          val was = currentMeta(dir).refs.find(_.name == branch).map(_.snapshotId)
          GraftTable.removeRef(dir, branch, expectedType = Some("branch"))
          Seq(InternalRow(UTF8String.fromString(branch), was.getOrElse(0L)))
        })
      case "create_branch" => new Proc(
        "create_branch",
        "create a mutable branch ref at a snapshot (default: the current " +
          "head) — the staging target of write-audit-publish",
        Array(in("table", StringType), in("branch", StringType),
          inDefault("snapshot_id", LongType, "NULL"),
          inDefault("max_ref_age_ms", LongType, "NULL"),
          inDefault("min_snapshots_to_keep", IntegerType, "NULL"),
          inDefault("max_snapshot_age_ms", LongType, "NULL")),
        StructType(Seq(
          StructField("branch", StringType),
          StructField("snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          val branch = input.getUTF8String(1).toString
          val snapId = if (input.isNullAt(2)) None else Some(input.getLong(2))
          val result = GraftTable.createBranch(dir, branch, snapId,
            maxRefAgeMs = if (input.isNullAt(3)) None else Some(input.getLong(3)),
            minSnapshotsToKeep = if (input.isNullAt(4)) None else Some(input.getInt(4)),
            maxSnapshotAgeMs = if (input.isNullAt(5)) None else Some(input.getLong(5)))
          val at = result.metadata.refs.find(_.name == branch).get.snapshotId
          Seq(InternalRow(UTF8String.fromString(branch), at))
        })
      case "rewrite_manifests" => new Proc(
        "rewrite_manifests",
        "consolidate the current snapshot's data manifests (one per " +
          "partition tuple; one per spec id when untagged), preserving " +
          "every entry's sequence number and the field-507 summaries, " +
          "and backfill spec field-110 null counts on pre-110 equality " +
          "deletes; CAS commit, data files never read",
        Array(in("table", StringType)),
        StructType(Seq(
          StructField("rewritten_manifests_count", IntegerType),
          StructField("added_manifests_count", IntegerType),
          StructField("snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          def dataManifests(meta: TableMetadata): Int =
            meta.currentSnapshot.flatMap(_.manifestList).toSeq
              .flatMap(ManifestListReader.read).count(_.content == 0)
          val before = dataManifests(currentMeta(dir))
          val result = GraftTable.rewriteManifests(SparkSession.active, dir)
          val after = dataManifests(result.metadata)
          Seq(InternalRow(before, after,
            result.metadata.currentSnapshotId.getOrElse(0L)))
        })
      case "remove_orphan_files" => new Proc(
        "remove_orphan_files",
        "delete data-directory files (parquet + deletion-vector puffin) " +
          "unreachable from EVERY snapshot still in the metadata, as a " +
          "distributed anti-join with executor-side deletes; " +
          "older_than_ms (default: no age filter) protects in-flight " +
          "writers; dry_run => true counts without deleting",
        Array(in("table", StringType),
          inDefault("older_than_ms", LongType, "NULL"),
          inDefault("dry_run", BooleanType, "false")),
        StructType(Seq(
          StructField("deleted_files_count", IntegerType))),
        input => {
          val dir = dirOf(input)
          val olderThan = if (input.isNullAt(1)) None else Some(input.getLong(1))
          val deleted = GraftTable.removeOrphanFiles(SparkSession.active, dir,
            olderThan, dryRun = !input.isNullAt(2) && input.getBoolean(2))
          // toIntExact, not toInt: past 2^31 swept files a silent wrap
          // would report a negative/garbage count — fail loudly instead
          // (the result schema is oracle-pinned IntegerType)
          Seq(InternalRow(Math.toIntExact(deleted)))
        })
      case "delete_reachable_files" => new Proc(
        "delete_reachable_files",
        "delete EVERY file reachable from a metadata document (content " +
          "files of all statuses, manifests, manifest lists, statistics, " +
          "the whole metadata-log) — the cleanup half of dropping a " +
          "table the catalog no longer owns (a register_table pointer " +
          "DROP keeps the files; this reclaims them). Refuses " +
          "gc.enabled=false forks and stale document versions; " +
          "dry_run => true counts without deleting",
        Array(in("metadata_file", StringType),
          inDefault("dry_run", BooleanType, "false")),
        StructType(Seq(
          StructField("deleted_content_files_count", IntegerType),
          StructField("deleted_manifests_count", IntegerType),
          StructField("deleted_manifest_lists_count", IntegerType),
          StructField("deleted_metadata_files_count", IntegerType),
          StructField("deleted_statistics_files_count", IntegerType))),
        input => {
          val r = GraftTable.deleteReachableFiles(SparkSession.active,
            input.getUTF8String(0).toString,
            dryRun = !input.isNullAt(1) && input.getBoolean(1))
          // toIntExact: see remove_orphan_files — loud overflow, not a wrap
          Seq(InternalRow(Math.toIntExact(r.contentFilesCount), r.manifests.size,
            r.manifestLists.size, r.metadataFiles.size, r.statisticsFiles.size))
        })
      case "fast_forward" => new Proc(
        "fast_forward",
        "publish main onto the named ref's snapshot (write-audit-publish); " +
          "refuses non-descendants",
        Array(in("table", StringType), in("ref", StringType)),
        StructType(Seq(
          StructField("previous_snapshot_id", LongType),
          StructField("current_snapshot_id", LongType))),
        input => {
          val dir = dirOf(input)
          val previous = currentMeta(dir).currentSnapshotId.getOrElse(0L)
          val result = GraftTable.fastForward(dir,
            input.getUTF8String(1).toString)
          Seq(InternalRow(previous, result.metadata.currentSnapshotId.getOrElse(0L)))
        })
    }
  }
}
