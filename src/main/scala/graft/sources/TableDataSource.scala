package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.iceberg.{GraftTable, IcebergType, ManifestListReader, ManifestWriter, Par,
  ScanPlanning, SingleValueCodec, IcebergTypes, TableMetadata}

/** DataSource V2 connector for whole-TABLE reads:
  * `spark.read.format("graft-table").option("metadata", <metadata.json>)`.
  *
  * The Catalyst-integrated route to GraftTable's planning — the caller
  * writes `df.filter($"k" === v)` and the FILTER drives the metadata
  * pruning instead of a hand-called readWhere:
  *
  *   - level 1 (manifest-list): pushed equality predicates convert into
  *     each spec's partition-transform space and prune DATA manifests
  *     against their field-507 summaries WITHOUT OPENING THEM (i33/i37's
  *     rule, now behind `spark.read.format`);
  *   - level 2 (manifest entry): surviving files prune against their
  *     decoded column bounds (fields 125/128) — both levels conservative,
  *     and every pushed filter stays residual for Spark to re-check;
  *   - surviving manifests open CONCURRENTLY (Par), entry-level null
  *     sequence numbers inherit the list's field 515;
  *   - BOTH delete kinds apply INSIDE each file's reader — the partition
  *     carries its sequence-scoped delete files (position: data seq <=
  *     delete seq, narrowed by the delete file's file_path bound stats;
  *     equality: strictly lower data seq only), and the reader loads
  *     positions into an index set and equality tuples into value sets,
  *     skipping matching rows while streaming: Iceberg's production MOR
  *     shape, where delete application is task-local and NO join appears
  *     in the plan;
  *   - `snapshot-id` / `ref` / `as-of-timestamp-ms` options time-travel
  *     with GraftTable.read's resolution rules.
  *
  * Scale notes: planning I/O is list + surviving manifests (concurrent,
  * KB-scale each); statistics report the EXACT byte size from manifest
  * entries so Catalyst can broadcast small tables. One InputPartition per
  * data file (the manifest's granularity); a production reader would
  * additionally split by row group and use a vectorized decoder — this
  * reader streams record-at-a-time via parquet's Group API, trading
  * per-row speed for zero dependence on Spark internals. */
object TableDataSource {
  /** v3 initial-defaults (external row domain) by column name — what a
    * reader fills for a column the file predates, instead of null. */
  private[sources] def initialDefaultsOf(meta: TableMetadata): Map[String, Any] =
    meta.currentSchema.fields.flatMap(f =>
      f.initialDefault.flatMap(d => IcebergTypes.fromStringOpt(f.fieldType)
        .map(t => f.name -> graft.iceberg.DefaultValues.fromJson(t, d)))).toMap
}

class TableDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  private def metadataPath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("metadata")
    require(p != null && p.nonEmpty, "graft-table requires option(\"metadata\", <metadata.json>)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTable.sparkSchema(TableMetadata.parseFile(metadataPath(options)))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftSparkTable(schema, metadataPath(opts),
      Option(opts.get("snapshot-id")).map(_.toLong),
      Option(opts.get("ref")),
      Option(opts.get("as-of-timestamp-ms")).map(_.toLong),
      Option(opts.get("split-size")).map(_.toLong).getOrElse(128L * 1024 * 1024),
      // escape hatch (and the bench's row-vs-columnar control): "false"
      // forces the row route; it can never force columnar ON — the
      // scan-level eligibility rules still apply
      Option(opts.get("columnar")).forall(_.toBoolean),
      // write-side: option("branch", "audit") stages appends on that ref
      Option(opts.get("branch")).filter(_.nonEmpty))
  }

  override def supportsExternalMetadata(): Boolean = false
}

class GraftSparkTable(tableSchema: StructType, metadataPath: String,
    snapshotId: Option[Long], ref: Option[String], asOfTimestampMs: Option[Long],
    splitSize: Long, allowColumnar: Boolean = true,
    writeBranch: Option[String] = None,
    // set for identifiers that must stay read-only (tag_<name>): any
    // write surface refuses with this message instead of silently
    // landing the commit on main
    refuseWriteReason: Option[String] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** SQL UPDATE / DELETE / MERGE INTO, two modes per the Iceberg table
    * properties `write.update.mode` / `write.delete.mode` /
    * `write.merge.mode`:
    *
    *   - **copy-on-write** (default): Spark reads the AFFECTED groups
    *     through the operation's scan (pushed conditions prune unaffected
    *     files at both metadata levels — those carry forward untouched),
    *     computes the replacement rows, and the commit swaps exactly the
    *     scanned files in one CAS replace snapshot. Best for read-heavy
    *     tables: no delete files accumulate.
    *   - **merge-on-read**: the delta route (`SupportsDelta`) — Spark
    *     hands per-row operations keyed by the scan's (_file, _pos) row
    *     coordinates, and the commit lands position-delete files + new
    *     data files in ONE snapshot: O(changed rows) write I/O, no
    *     rewrite of untouched data. Best for write-heavy / CDC tables. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => {
      refuseWriteReason.foreach(r => throw new UnsupportedOperationException(r))
      // With a `t.branch_<name>` identifier the whole operation is
      // BRANCH-SCOPED (the WAP story for edits): the operation's scan
      // plans against the branch head (ref-resolved, like any branch
      // read), and the replace/delta commit validates against and chains
      // from that head, moving only the branch ref — main never sees the
      // edit until fast_forward publishes it.
      import org.apache.spark.sql.connector.write.RowLevelOperation.Command._
      val modeKey = info.command() match {
        case UPDATE => "write.update.mode"
        case DELETE => "write.delete.mode"
        case _ => "write.merge.mode"
      }
      val mor = TableMetadata.parseFile(metadataPath).properties
        .get(modeKey).contains("merge-on-read")
      if (mor)
        new GraftDeltaRowLevelOperation(info.command(), tableSchema,
          metadataPath, splitSize, branch = writeBranch)
      else
        new GraftRowLevelOperation(info.command(), tableSchema,
          metadataPath, splitSize, branch = writeBranch)
    }
  override def name(): String = s"graft-table($metadataPath)"
  override def schema(): StructType = tableSchema

  /** The default partition spec surfaced as Spark transforms — what
    * `DESCRIBE TABLE` prints and catalog tooling introspects. Unknown
    * transform strings (a foreign writer's) surface as identity on the
    * source column rather than failing the table load. */
  override def partitioning(): Array[Transform] =
    SpecTransforms.of(TableMetadata.parseFile(metadataPath))

  /** Iceberg's inspection columns: `_file` (the data file serving the
    * row) and `_pos` (its file-absolute row index — the coordinate
    * position deletes address). Selectable like any column; never in
    * `SELECT *`. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = Array(
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_file"
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
    },
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_pos"
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
    },
    // v3 row lineage (null on pre-v3 tables): _row_id = the file's
    // first_row_id + pos, or the materialized column a rewrite carried;
    // _last_updated_sequence_number = the row's data sequence likewise
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_row_id"
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = true
    },
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_last_updated_sequence_number"
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = true
    })
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftTableScanBuilder(tableSchema, metadataPath, snapshotId, ref,
      asOfTimestampMs, splitSize, allowColumnar = allowColumnar,
      streamOpts = StreamReadOptions(
        skipOverwrites = Option(options.get("streaming-skip-overwrite-snapshots"))
          .exists(_.toBoolean),
        startingSnapshotId = Option(options.get("starting-snapshot-id"))
          .map(_.toLong),
        startingTimestampMs = Option(options.get("starting-timestamp-ms"))
          .map(_.toLong),
        maxSnapshotsPerTrigger = Option(options.get("max-snapshots-per-trigger"))
          .map(_.toInt)))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    refuseWriteReason.foreach(r => throw new UnsupportedOperationException(r))
    new GraftTableWriteBuilder(metadataPath, info, writeBranch)
  }

  /** SQL `DELETE FROM ... WHERE ...`: the pushed predicate translates to
    * a Column and lands as GraftTable.deleteWhere's position-delete
    * commit — merge-on-read row-level delete, no rewrite, CAS-serialized
    * with every other writer. */
  private def toColumn(f: sources.Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, not}
    f match {
      case sources.EqualTo(a, v) => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case sources.IsNull(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) => Some(col(a).isNotNull)
      case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case sources.And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
      case sources.Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
      case sources.Not(c) => toColumn(c).map(not)
      case _: sources.AlwaysTrue => Some(lit(true))
      case _: sources.AlwaysFalse => Some(lit(false))
      case _ => None
    }
  }

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    filters.forall(toColumn(_).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    refuseWriteReason.foreach(r => throw new UnsupportedOperationException(r))
    import org.apache.spark.sql.functions.lit
    val cond = filters.flatMap(toColumn).reduceOption(_ && _).getOrElse(lit(true))
    val tableDir = new org.apache.hadoop.fs.Path(metadataPath).getParent.toString
    // a branch-suffixed identifier stages the delete on the BRANCH:
    // scan, carried manifests and the ref move are all branch-scoped
    GraftTable.deleteWhere(
      org.apache.spark.sql.SparkSession.active, tableDir, cond, writeBranch)
  }
}

/** The default partition spec as Spark connector transforms — shared by
  * `Table.partitioning()` (DESCRIBE / catalog introspection) and the
  * scan's `KeyGroupedPartitioning` report, so the two can never drift.
  * Unknown transform strings (a foreign writer's) surface as identity on
  * the source column rather than failing the table load — callers that
  * need strictness (SPJ) gate on `ScanPlanning.transformResultType`. */
private[sources] object SpecTransforms {
  def of(meta: TableMetadata): Array[Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    val BucketRe = """bucket\[(\d+)\]""".r
    val TruncateRe = """truncate\[(\d+)\]""".r
    meta.partitionSpecs.find(_.specId == meta.defaultSpecId).toArray
      .flatMap(_.fields).flatMap { pf =>
        meta.currentSchema.fields.find(_.id == pf.sourceId).map { f =>
          pf.transform match {
            case "identity" => Expressions.identity(f.name)
            case BucketRe(n) => Expressions.bucket(n.toInt, f.name)
            case TruncateRe(w) => Expressions.apply("truncate",
              Expressions.literal(w.toInt), Expressions.column(f.name))
            case "year" => Expressions.years(f.name)
            case "month" => Expressions.months(f.name)
            case "day" => Expressions.days(f.name)
            case "hour" => Expressions.hours(f.name)
            case _ => Expressions.identity(f.name)
          }
        }
      }
  }
}

class GraftTableScanBuilder(tableSchema: StructType, metadataPath: String,
    snapshotId: Option[Long], ref: Option[String], asOfTimestampMs: Option[Long],
    splitSize: Long, onPlanned: Option[(Seq[String], Seq[String]) => Unit] = None,
    allowColumnar: Boolean = true,
    streamOpts: StreamReadOptions = StreamReadOptions())
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = tableSchema
  private var pushed: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    // accept what the two pruning levels can use; EVERYTHING stays
    // residual — pruning is a best-effort skip, Spark re-checks rows
    pushed = filters.filter(FileBoundsEval.supported(_, tableSchema))
    filters
  }

  override def pushedFilters(): Array[sources.Filter] = pushed

  /** Aggregate pushdown from manifest STATS — `SELECT COUNT(*) | MIN(c) |
    * MAX(c) FROM t` answers in one KB-scale metadata pass with ZERO data
    * bytes read: record counts sum from the entries, MIN/MAX decode from
    * the entry bound stats. This is what the stats exist for, and at
    * 100 TB it is the difference between milliseconds and a full scan.
    * Strictly exactness-gated — served ONLY when every entry can prove
    * the answer (Spark offers the pushdown only on filterless scans):
    *   - COUNT(*): no pending deletes (deleted rows are unknowable
    *     unscanned); record counts always present;
    *   - MIN/MAX(c): additionally every entry carries decodable bounds
    *     for c (an all-null or stats-less file refuses the push), and
    *     floating-point columns refuse (NaN sorts above +Inf in Spark
    *     but writers exclude it from bounds — the stats can't see it);
    *   - MIN/MAX over string/binary-ordered columns additionally
    *     requires PROOF the bounds are whole values: the Iceberg spec
    *     allows truncated bounds (production writers default to
    *     `truncate(16)`, where the upper bound is a prefix-incremented
    *     value that need not exist in the data), so the push is only
    *     legal on tables stamped `graft.metrics=full` — set by this
    *     engine's own writer, whose stats are always derived whole from
    *     the written file. A foreign table without the stamp falls back
    *     to the scan. Numeric/date/timestamp/decimal bounds are exact
    *     single-value encodings whenever present — no stamp needed.
    * Anything unprovable falls back to the ordinary scan.
    *
    * Spark probes `supportCompletePushDown`, `pushAggregation`, and then
    * `build()` on one builder — the manifest sweep is memoized per
    * Aggregation instance so planning pays it once. */
  private var aggResult: Option[(StructType, Seq[Any])] = None
  private var aggMemo: Option[(AnyRef, Option[(StructType, Seq[Any])])] = None

  private def serveFromStatsMemo(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Seq[Any])] = aggMemo match {
    case Some((key, cached)) if key eq agg => cached
    case _ =>
      val computed = serveFromStats(agg)
      aggMemo = Some((agg, computed))
      computed
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    serveFromStatsMemo(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    aggResult = serveFromStatsMemo(agg)
    aggResult.isDefined
  }

  private def serveFromStats(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Seq[Any])] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    if (pushed.nonEmpty || onPlanned.isDefined || agg.groupByExpressions().nonEmpty)
      return None
    val meta = scala.util.Try(TableMetadata.parseFile(metadataPath)).getOrElse(return None)
    val empty = meta.currentSnapshotId.isEmpty && snapshotId.isEmpty &&
      ref.isEmpty && asOfTimestampMs.isEmpty
    val entries: Seq[ManifestWriter.EntryData] =
      if (empty) Nil
      else scala.util.Try {
        val snap = GraftTable.resolveForScan(meta, snapshotId, ref, asOfTimestampMs)
        val infos = snap.manifestList.toSeq.flatMap(ManifestListReader.read)
        val live = Par.inParallel(infos)(i => ManifestWriter.read(i.path)
          .filter(_.status != 2).map(e => (i.content, e))).flatten
        // any live delete entry → rows are unknowable from stats
        if (live.exists(_._2.content != 0)) return None
        live.collect { case (0, e) if e.content == 0 => e }
      }.getOrElse(return None)
    def fieldOf(name: String) = meta.currentSchema.fields.find(_.name == name)
    def boundValue(e: ManifestWriter.EntryData, fieldId: Int, t: IcebergType,
        lower: Boolean): Option[Any] =
      (if (lower) e.lowerBounds else e.upperBounds).get(fieldId).filter(_.nonEmpty)
        .flatMap(b => scala.util.Try(SingleValueCodec.decode(t, b)).toOption)
    // string/binary-ordered bounds may be TRUNCATED by foreign writers
    // (spec-legal; `truncate(16)` is the production default) — serve
    // them only when the table's writer proved whole-value bounds
    val exactBounds = meta.properties.get("graft.metrics").contains("full")
    def truncatable(t: IcebergType): Boolean = t match {
      case IcebergTypes.TString | IcebergTypes.TBinary | IcebergTypes.TUuid |
           IcebergTypes.TFixed(_) => true
      case _ => false
    }
    def extreme(colName: String, lower: Boolean): Option[(DataType, Any)] = for {
      f <- fieldOf(colName)
      t <- IcebergTypes.fromStringOpt(f.fieldType)
      // float/double bounds exclude NaN, which Spark's MIN/MAX must see
      if !t.sparkType.isInstanceOf[FloatType] && !t.sparkType.isInstanceOf[DoubleType]
      if exactBounds || !truncatable(t)
      vs <- Some(entries.map(e => boundValue(e, f.id, t, lower)))
        .filter(_.forall(_.isDefined)).map(_.flatten)
      v <- vs.reduceOption { (a, b) =>
        EntryFilterEval.cmp(Some(a), b) match {
          case Some(c) => if ((c < 0) == lower) a else b
          case None => return None
        }
      }
    } yield (t.sparkType, v)
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case ref: NamedReference if ref.fieldNames().length == 1 =>
          Some(ref.fieldNames().head)
        case _ => None
      }
    val served = agg.aggregateExpressions().toSeq.map {
      case _: CountStar =>
        Some((StructField("count(*)", LongType, nullable = false),
          entries.map(_.recordCount).sum: Any))
      case m: Min => for {
        c <- colOf(m.column()); (dt, v) <-
          (if (entries.isEmpty) fieldOf(c).flatMap(f =>
            IcebergTypes.fromStringOpt(f.fieldType)).map(t => (t.sparkType, null: Any))
          else extreme(c, lower = true).map { case (dt, v) => (dt, v: Any) })
      } yield (StructField(s"min($c)", dt), v)
      case m: Max => for {
        c <- colOf(m.column()); (dt, v) <-
          (if (entries.isEmpty) fieldOf(c).flatMap(f =>
            IcebergTypes.fromStringOpt(f.fieldType)).map(t => (t.sparkType, null: Any))
          else extreme(c, lower = false).map { case (dt, v) => (dt, v: Any) })
      } yield (StructField(s"max($c)", dt), v)
      case _ => None
    }
    if (served.exists(_.isEmpty)) None
    else Some((StructType(served.flatten.map(_._1)), served.flatten.map(_._2)))
  }

  override def build(): Scan = aggResult match {
    case Some((schema, values)) =>
      val converted = schema.fields.zip(values).map { case (f, v) =>
        if (v == null) null
        else CatalystTypeConverters.createToCatalystConverter(f.dataType)(v)
      }
      new org.apache.spark.sql.connector.read.LocalScan {
        override def rows(): Array[InternalRow] = Array(
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            converted.toArray[Any]))
        override def readSchema(): StructType = schema
        override def description(): String =
          s"graft-table stats-served aggregate $metadataPath"
      }
    case None =>
      new GraftTableScan(required, pushed, metadataPath, snapshotId, ref,
        asOfTimestampMs, splitSize, onPlanned, allowColumnar, streamOpts)
  }
}

class GraftTableScan(required: StructType, filters: Array[sources.Filter],
    metadataPath: String, snapshotId: Option[Long], ref: Option[String],
    asOfTimestampMs: Option[Long], splitSize: Long = 128L * 1024 * 1024,
    onPlanned: Option[(Seq[String], Seq[String]) => Unit] = None,
    allowColumnar: Boolean = true,
    streamOpts: StreamReadOptions = StreamReadOptions())
    extends Scan with Batch with SupportsReportStatistics
    with SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftTableMicroBatchStream(metadataPath, required, streamOpts, hadoopConf,
      allowColumnar)
  override def description(): String =
    s"graft-table scan $metadataPath, ReadSchema: ${required.catalogString}" +
      (if (filters.nonEmpty) s", PushedFilters: ${filters.mkString("[", ", ", "]")}" else "")

  private val hadoopConf = new graft.iceberg.SerializableHadoopConf(
    graft.iceberg.HadoopConfs.active())

  /** The snapshot is PINNED at first use and every subsequent planning
    * pass — static, runtime-filtered, and row-level bookkeeping — reuses
    * it: re-resolving the head per pass would let a concurrent commit
    * slide a different snapshot under one query (two scans of the same
    * table in one join disagreeing, a row-level operation recording
    * files from a snapshot newer than its intent). Iceberg pins at scan
    * creation; so do we. */
  private lazy val pinnedMeta: TableMetadata = TableMetadata.parseFile(metadataPath)

  /** (surviving data entries — each with sequence and OWNING manifest
    * info (the list row: spec id + field-507 summaries, which is what
    * derives storage-partitioned-join keys) —, position-delete entries,
    * equality-delete entries) — the driver-side planning pass, shared by
    * partitions and statistics. Runs once per scan. */
  private lazy val planned: (Seq[(ManifestWriter.EntryData, Long, ManifestListReader.ManifestFileInfo)],
      Seq[(ManifestWriter.EntryData, Long)], Seq[(ManifestWriter.EntryData, Long)]) = {
    // a freshly created (never-appended) table has no snapshot: it reads
    // as zero rows, not an error — explicit time travel still throws
    if (emptyTable) (Nil, Nil, Nil)
    else plannedFor(pinnedMeta)
  }

  private def emptyTable: Boolean =
    pinnedMeta.currentSnapshotId.isEmpty && snapshotId.isEmpty && ref.isEmpty &&
      asOfTimestampMs.isEmpty

  /** EVERY live delete file in the pinned scan snapshot — not just the
    * subset the pruning kept. Row-level commits validate "no delete
    * landed between my scan and my commit" by subtracting this set from
    * the commit base's; recording only the pruned-applied subset would
    * misclassify a legitimately pruned pre-existing delete (sequence
    * ceiling, partition summaries) as concurrent and permanently block
    * valid UPDATE/MERGE. Computed only for row-level operations
    * (onPlanned present), never for plain reads. */
  private lazy val allDeletePathsAtScan: Seq[String] =
    if (emptyTable) Nil
    else {
      val snap = GraftTable.resolveForScan(pinnedMeta, snapshotId, ref, asOfTimestampMs)
      val infos = snap.manifestList.toSeq.flatMap(ManifestListReader.read)
        .filter(_.content == 1)
      Par.inParallel(infos)(i => ManifestWriter.read(i.path))
        .flatten.filter(_.status != 2).map(_.filePath)
    }

  /** DPP-style runtime filtering (`SupportsRuntimeFiltering`): a
    * broadcast join's build side materializes, Spark converts its keys
    * into In/EqualTo filters on the probe side's join columns, and THIS
    * scan re-plans with them — manifests prune in transform space, files
    * prune on bound stats, before a single fact byte is read. At 100 TB
    * this is the difference between scanning the whole fact table and
    * scanning the partitions the dimension filter actually selects. */
  @volatile private var runtimeFilters: Array[sources.Filter] = Array.empty

  /** Only columns this scan OUTPUTS: Spark resolves these against the
    * scan's (column-pruned) output, so advertising unprojected columns
    * breaks analysis of unrelated plans (e.g. a pruned row-level DELETE
    * scan emitting [key, _file, _pos]). And only COMPARABLE primitive
    * types: the consumers build equality predicates on these attributes
    * (DPP IN-subqueries, row-level runtime group filters) — a VARIANT
    * or MAP attribute has no equality, and advertising one turns the
    * rewritten plan unresolved (Spark's
    * RowLevelOperationRuntimeGroupFiltering validation failure on any
    * DML over a variant table). Bound-stat pruning can't use such
    * columns anyway. */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fields
      .filterNot(f => f.name == "_file" || f.name == "_pos" ||
        f.name == "_row_id" || f.name == "_last_updated_sequence_number")
      .filter(f => f.dataType match {
        case org.apache.spark.sql.types.VariantType => false
        case _: org.apache.spark.sql.types.MapType => false
        case _: org.apache.spark.sql.types.ArrayType => false
        case _: org.apache.spark.sql.types.StructType => false
        case _ => true
      })
      .map(f => org.apache.spark.sql.connector.expressions.Expressions.column(f.name))

  override def filter(fs: Array[sources.Filter]): Unit =
    runtimeFilters = fs.filter(FileBoundsEval.supported(_, required))

  private def plannedFor(meta: TableMetadata)
      : (Seq[(ManifestWriter.EntryData, Long, ManifestListReader.ManifestFileInfo)],
      Seq[(ManifestWriter.EntryData, Long)], Seq[(ManifestWriter.EntryData, Long)]) =
    plannedWith(meta, filters)

  private def plannedWith(meta: TableMetadata, filters: Array[sources.Filter])
      : (Seq[(ManifestWriter.EntryData, Long, ManifestListReader.ManifestFileInfo)],
      Seq[(ManifestWriter.EntryData, Long)], Seq[(ManifestWriter.EntryData, Long)]) = {
    val snap = GraftTable.resolveForScan(meta, snapshotId, ref, asOfTimestampMs)
    val listPath = snap.manifestList.getOrElse(throw new IllegalArgumentException(
      s"snapshot ${snap.snapshotId} has no manifest-list"))
    val infos = ManifestListReader.read(listPath)
    val dataInfos0 = infos.filter(_.content == 0)
    // level 1: pushed predicates prune manifests in the spec's transform
    // space (summaries consulted, manifests unopened). Equality prunes
    // through EVERY transform incl. bucket; comparisons fold into a value
    // range per column and prune through the monotonic transforms.
    def fieldId(c: String): Option[Int] =
      meta.currentSchema.fields.find(_.name == c).map(_.id)
    val eqPairs = filters.collect {
      case sources.EqualTo(c, v) => fieldId(c).map((_, v)) }.flatten
    // In-sets (the shape runtime join filters arrive in): a manifest
    // survives when ANY of the set's values survives it — the per-value
    // transform prunes union
    val inSets = filters.collect {
      case sources.In(c, vs) if vs.nonEmpty => fieldId(c).map((_, vs.toSeq)) }.flatten
    val ranges = filters.collect {
        case sources.GreaterThan(c, v) => (c, Some(v), None)
        case sources.GreaterThanOrEqual(c, v) => (c, Some(v), None)
        case sources.LessThan(c, v) => (c, None, Some(v))
        case sources.LessThanOrEqual(c, v) => (c, None, Some(v))
      }.groupBy(_._1).toSeq.flatMap { case (c, bs) =>
        fieldId(c).map(fid =>
          (fid, bs.flatMap(_._2).lastOption, bs.flatMap(_._3).lastOption))
      }
    val afterEq = eqPairs.foldLeft(infos.map(_.path).toSet) {
      case (acc, (fid, v)) =>
        acc.intersect(ScanPlanning.pruneManifestsByTransform(listPath, meta, fid, v)
          .map(_.path).toSet)
    }
    val afterIn = inSets.foldLeft(afterEq) { case (acc, (fid, vs)) =>
      acc.intersect(vs.map(v =>
        ScanPlanning.pruneManifestsByTransform(listPath, meta, fid, v)
          .map(_.path).toSet).reduce(_ union _))
    }
    val surviving = ranges.foldLeft(afterIn) { case (acc, (fid, lo, hi)) =>
      acc.intersect(ScanPlanning.pruneManifestsByRange(listPath, meta, fid, lo, hi)
        .map(_.path).toSet)
    }
    val dataEntries = Par.inParallel(dataInfos0.filter(i => surviving(i.path)))(
        i => (i, ManifestWriter.read(i.path))).flatMap { case (i, es) =>
      es.filter(e => e.status != 2 && e.content == 0)
        .map(e => (e, e.sequenceNumber.getOrElse(i.sequenceNumber), i))
    }
    // level 2: entry bound stats prune files the filters cannot match
    val kept = dataEntries.filterNot { case (e, _, _) =>
      filters.exists(f => FileBoundsEval.skippable(f, e, meta)) }
    // delete-side manifest pruning, the data-side rules applied
    // symmetrically and conservatively — a skipped manifest is NEVER
    // opened: (a) the pushed predicate's transform-space summary prune
    // (a partition-scoped delete can't address data in a partition its
    // summaries exclude; summary-less manifests are kept), and (b) the
    // sequence ceiling: list-level field 515 bounds every entry inside,
    // so a delete manifest wholly below the kept data files' minimum
    // sequence can't reach any of them under the <=/< application rules
    val minKeptSeq = kept.map(_._2).minOption.getOrElse(Long.MaxValue)
    val delInfos = infos.filter(i => i.content == 1 && surviving(i.path) &&
      i.sequenceNumber >= minKeptSeq)
    val delEntries = Par.inParallel(delInfos)(i => (i, ManifestWriter.read(i.path)))
      .flatMap { case (i, es) => es.filter(_.status != 2)
        .map(e => (e, e.sequenceNumber.getOrElse(i.sequenceNumber))) }
    (kept, delEntries.filter(_._1.content == 1), delEntries.filter(_._1.content == 2))
  }

  /** Does this position-delete file possibly address `dataFile`? Bound
    * stats under the RESERVED file_path field id (written by deleteWhere)
    * answer without opening the delete file — missing bounds keep it.
    * This is what bounds per-task delete loads at 10⁵ delete files. */
  private def mayAddress(del: ManifestWriter.EntryData, dataFile: String): Boolean = {
    def norm(p: String) = p.replaceFirst("^[a-z0-9+.-]+:(//)?", "")
    def decode(m: Map[Int, Array[Byte]]): Option[String] =
      m.get(ManifestWriter.PosDeleteFilePathId).filter(_.nonEmpty)
        .flatMap(b => scala.util.Try(
          SingleValueCodec.decode(IcebergTypes.TString, b).asInstanceOf[String]).toOption)
    val me = norm(dataFile)
    decode(del.lowerBounds).forall(lo => norm(lo) <= me) &&
      decode(del.upperBounds).forall(hi => norm(hi) >= me)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // runtime join filters (if any arrived) re-plan on top of the static
    // pushed set — against the SAME pinned snapshot the static plan and
    // statistics used; `planned` stays the statistics baseline
    val (kept, posDeletes, eqDeletes) =
      if (runtimeFilters.isEmpty) planned
      else if (emptyTable) (Nil, Nil, Nil)
      else plannedWith(pinnedMeta, filters ++ runtimeFilters)
    // row-level (UPDATE/MERGE) scans record the served group set — the
    // files the replace commit must swap — AND the FULL delete-file set
    // live at scan time (not the pruned-applied subset), so the commit
    // can tell a delete added concurrently from one it provably skipped
    onPlanned.foreach(cb => cb(kept.map(_._1.filePath), allDeletePathsAtScan))
    val tableSchema = GraftTable.sparkSchema(pinnedMeta)
    val alternates = GraftTable.nameAlternates(pinnedMeta)
    val keysByFile = spj.map(_._2).getOrElse(Map.empty)
    val scanDefaults = TableDataSource.initialDefaultsOf(pinnedMeta)
    def normP(p: String) = p.replaceFirst("^[a-z0-9+.-]+:(//)?", "")
    // v3 deletion vectors index by their referenced file UP FRONT: a v3
    // table carries one DV per data file, so a per-partition linear scan
    // over the delete entries would be O(files²) planning at 10⁵ files —
    // the hash lookup keeps it O(files). v2 parquet position deletes
    // stay a linear filter (their count tracks DELETE commits, not
    // files, and the path-bound check is the pruning that matters).
    val pqPosDeletes = posDeletes.filter(_._1.fileFormat != "PUFFIN")
    val dvByFile: Map[String, Seq[(ManifestWriter.EntryData, Long)]] =
      posDeletes.filter(_._1.fileFormat == "PUFFIN")
        .groupBy(d => normP(d._1.referencedDataFile.getOrElse("")))
    def partition(e: ManifestWriter.EntryData, seq: Long,
        rowGroup: Int, rowStart: Long): GraftTableInputPartition = {
      // v2 applicability: a position delete addresses data files with
      // sequence <= its own (later-sequence delete files only), further
      // scoped by the delete file's file_path bound stats; an equality
      // delete applies only to STRICTLY lower data sequence numbers.
      // v3 deletion vectors address exactly one file (field 143) and
      // ride as a (path, offset, length) blob coordinate
      GraftTableInputPartition(e.filePath, seq,
        pqPosDeletes.filter { case (d, dseq) =>
          dseq >= seq && mayAddress(d, e.filePath) }.map(_._1.filePath),
        eqDeletes.filter(_._2 > seq).map(_._1.filePath),
        tableSchema,
        dvRefs = dvByFile.getOrElse(normP(e.filePath), Nil)
          .filter(_._2 >= seq)
          .map(d => (d._1.filePath, d._1.contentOffset.getOrElse(0L),
            d._1.contentSizeInBytes.getOrElse(0L))),
        rowGroup = rowGroup, rowStart = rowStart, nameAlternates = alternates,
        firstRowId = e.firstRowId,
        fileFormat = e.fileFormat,
        partitionKeyValues = keysByFile.get(e.filePath).map(_.toArray).orNull,
        initialDefaults = scanDefaults)
    }
    // files above the split threshold fan out ONE PARTITION PER ROW GROUP
    // (footer read at planning, concurrent, only for big files — the
    // manifest's fileSizeInBytes decides, so small files cost nothing);
    // each split carries its absolute first-row index so position deletes
    // keep addressing file-absolute row numbers, plus the group's byte
    // range so the columnar route can select exactly it by midpoint.
    //
    // Level 3 pruning: the SAME footer the split pass already paid for
    // carries per-row-group column statistics — a group the pushed (or
    // runtime) filters provably exclude is never emitted as a partition.
    // On a 100 TB sorted/clustered table this is the difference between
    // "read the whole 1 GB file the point lookup landed in" and "read
    // the one row group that can hold the key". rowStart still counts
    // the skipped groups' rows, so position deletes stay file-absolute.
    val allFilters = filters ++ runtimeFilters
    def skippableChunk(e: ManifestWriter.EntryData, rows: Long, bytes: Long,
        lo: Map[Int, Array[Byte]], hi: Map[Int, Array[Byte]]): Boolean =
      allFilters.nonEmpty && {
        val pseudo = ManifestWriter.EntryData(0, 0L, e.filePath, rows, bytes, lo, hi)
        allFilters.exists(f => FileBoundsEval.skippable(f, pseudo, pinnedMeta))
      }
    Par.inParallel(kept) { case (e, seq, _) =>
      if (e.fileSizeInBytes <= splitSize || e.fileFormat == "AVRO")
        Seq(partition(e, seq, -1, 0L)) // Avro containers carry no split index
      else if (e.fileFormat == "ORC") {
        // ORC's analog of row groups: one partition per STRIPE, with the
        // stripe statistics pruning exactly like parquet block stats
        val stripes = graft.iceberg.OrcDataFiles.stripes(
          e.filePath, pinnedMeta.currentSchema.fields)
        val starts = stripes.map(_._1).scanLeft(0L)(_ + _)
        stripes.zipWithIndex.flatMap { case ((rows, off, len, lo, hi), i) =>
          if (skippableChunk(e, rows, len, lo, hi)) None
          else Some(partition(e, seq, i, starts(i))
            .copy(splitStart = off, splitBytes = len))
        }
      } else {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(e.filePath), hadoopConf.value))
        val blocks = try r.getRowGroups.asScala.toSeq finally r.close()
        val starts = blocks.map(_.getRowCount).scanLeft(0L)(_ + _)
        blocks.zipWithIndex.flatMap { case (b, rg) =>
          val (lo, hi) =
            if (allFilters.isEmpty) (Map.empty[Int, Array[Byte]], Map.empty[Int, Array[Byte]])
            else graft.iceberg.ParquetFooterStats
              .blockBoundsEncoded(b, pinnedMeta.currentSchema.fields)
          if (skippableChunk(e, b.getRowCount, b.getCompressedSize, lo, hi)) None
          else Some(partition(e, seq, rg, starts(rg))
            .copy(splitStart = b.getStartingPos, splitBytes = b.getCompressedSize))
        }
      }
    }.flatten.map(p => p: InputPartition).toArray
  }

  /** Columnar is a SCAN-level decision (Spark forbids mixing row and
    * columnar partitions in one scan): every required type must be in the
    * vectorized palette and metadata columns stay row-served. Pending
    * deletes of BOTH kinds keep the columnar route — the reader applies
    * position deletes as a row-index selection over each ColumnarBatch
    * and equality deletes as a vectorized value-set membership test over
    * the (schema-widened) batch columns (production Iceberg's
    * vectorized-MOR shape), so a delete-heavy CDC or streaming-upsert
    * table never pays the record-at-a-time decode penalty. Equality
    * deletes fall back to the row route only when an equality column's
    * type is outside the columnar comparison palette (binary/decimal/
    * nested — no cheap canonical batch-side value). */
  private lazy val columnarOk: Boolean = allowColumnar && {
    // struct/map columns vectorize only on DELETE-FREE scans: batches
    // then pass through raw, and the selection/shield views (whose
    // final getStruct walks children by the view's row-id) never wrap
    // them. Spark's vectorized reader decodes the nested vectors.
    val noDeletes = planned._2.isEmpty && planned._3.isEmpty
    // a RENAMED schema keeps the columnar route on delete-free scans
    // (the reader substitutes each file's own name generation into the
    // requested schema); renames + pending deletes take the row route —
    // the equality canonicalization there is name-history-aware
    val renames = GraftTable.nameAlternates(pinnedMeta)
    GraftTableColumnarReader.supportedSchema(required, allowNested = noDeletes) &&
      !required.fieldNames.exists(n => n == "_file" || n == "_pos" ||
        n == "_row_id" || n == "_last_updated_sequence_number") &&
      (planned._3.isEmpty || eqColumnsColumnar) &&
      (renames.isEmpty || noDeletes) &&
      // a required column with a v3 initial-default needs per-file
      // presence probing (fill the default, not null, where the file
      // predates it) — the row route does that; defaulted-column scans
      // are rare enough that the fallback is the honest trade
      !required.fieldNames.exists(
        TableDataSource.initialDefaultsOf(pinnedMeta).contains) &&
      // non-parquet data files (imported Avro) take the row route
      planned._1.forall(_._1.fileFormat == "PARQUET")
  }

  /** Every pending equality-delete file's column set must compare cleanly
    * in the columnar domain. One footer read per delete file (KB-scale,
    * concurrent) — the same planning boundary the manifest opens sit at. */
  private lazy val eqColumnsColumnar: Boolean = {
    val tableSchema = GraftTable.sparkSchema(pinnedMeta)
    Par.inParallel(planned._3.map(_._1.filePath).distinct) { del =>
      scala.util.Try {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(del), hadoopConf.value))
        try r.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSeq
        finally r.close()
      }.toOption.exists(_.forall(c =>
        tableSchema.fields.find(_.name == c).map(_.dataType).exists(
          GraftTableColumnarReader.eqComparable)))
    }.forall(identity)
  }

  /** Storage-partitioned joins: a partitioned table reports its layout
    * as a V2 `KeyGroupedPartitioning(transform(col), ...)`, and when BOTH
    * sides of a join report compatible partitionings on the join keys
    * (`spark.sql.sources.v2.bucketing.enabled`), Spark aligns the two
    * scans' partitions by key tuple and plans the join with NO shuffle on
    * either side — at 100 TB the difference between repartitioning two
    * fact tables and streaming co-located splits straight into the join.
    * Catalyst resolves the reported transforms against the owning
    * catalog's [[GraftFunctions]] (`V2ExpressionUtils` → FunctionCatalog).
    *
    * The per-file partition tuple derives from the OWNING manifest's
    * field-507 summaries: the engine's writers give every partition tuple
    * its own manifest, so a summary with lower == upper (and no nulls)
    * pins the tuple for every file inside — no new metadata and no data
    * bytes. Any kept file whose tuple cannot be proven that way (foreign
    * layout, pre-evolution spec, absent summaries) disables the report
    * for the whole scan: correctness never rides on a layout guess, the
    * plan just keeps its shuffle. */
  private lazy val spj: Option[(Array[Transform], Map[String, Seq[Any]])] = try {
    val meta = pinnedMeta
    for {
      spec <- meta.partitionSpecs.find(_.specId == meta.defaultSpecId)
        .filter(_.fields.nonEmpty)
      resultTypes = spec.fields.map { pf =>
        meta.currentSchema.fields.find(_.id == pf.sourceId)
          .flatMap(f => IcebergTypes.fromStringOpt(f.fieldType))
          .flatMap(st => ScanPlanning.transformResultType(pf.transform, st))
      }
      if resultTypes.forall(_.isDefined)
      keyed = planned._1.map { case (e, _, info) =>
        val tuple: Option[Seq[Any]] =
          if (info.specId != spec.specId) None
          else info.summaries.filter(_.size == spec.fields.size).flatMap { sums =>
            val vals = sums.zip(resultTypes.map(_.get)).map { case (s, t) =>
              for {
                lo <- s.lower.filter(_.nonEmpty)
                hi <- s.upper.filter(_.nonEmpty)
                dl = SingleValueCodec.decode(t, lo)
                dh = SingleValueCodec.decode(t, hi)
                if dl == dh && !s.containsNull
                iv <- spjInternalValue(t, dl)
              } yield iv
            }
            if (vals.forall(_.isDefined)) Some(vals.map(_.get)) else None
          }
        e.filePath -> tuple
      }
      if keyed.nonEmpty && keyed.forall(_._2.isDefined)
    } yield (SpecTransforms.of(meta), keyed.map { case (p, t) => p -> t.get }.toMap)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Summary-decoded external value → the catalyst representation the
    * key expression's data type stores (UTF8String, epoch days/micros,
    * Decimal) — what `HasPartitionKey.partitionKey` rows must hold. */
  private def spjInternalValue(t: IcebergType, v: Any): Option[Any] = (t, v) match {
    case (IcebergTypes.TInt, i: Int) => Some(i)
    case (IcebergTypes.TLong, l: Long) => Some(l)
    case (IcebergTypes.TString, s: String) =>
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    case (IcebergTypes.TBoolean, b: Boolean) => Some(b)
    case (IcebergTypes.TDate, d: java.time.LocalDate) => Some(d.toEpochDay.toInt)
    case (IcebergTypes.TTimestamp, dt: java.time.LocalDateTime) =>
      val i = dt.toInstant(java.time.ZoneOffset.UTC)
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
    case (IcebergTypes.TTimestamptz, i: java.time.Instant) =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
    case (IcebergTypes.TDecimal(_, _), bd: java.math.BigDecimal) =>
      Some(org.apache.spark.sql.types.Decimal(bd))
    // float/double partition sources are refused: NaN summary semantics
    // make single-value proofs unreliable, and no sane layout keys on them
    case _ => None
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    spj match {
      case Some((transforms, keys)) if keys.nonEmpty =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          transforms.map(t => t: org.apache.spark.sql.connector.expressions.Expression),
          keys.values.toSet.size)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  /** Exact size from manifest stats (what they exist for); row count only
    * when no deletes are pending (deleted rows are unknowable unscanned).
    * Column statistics ride along for Spark's CBO (join reorder, build-
    * side selection): min/max decode from the manifest entry bounds the
    * planning pass already holds, NDV + null counts come from the
    * snapshot's committed [[graft.iceberg.TableStats]] blob (the
    * `statistics` metadata entry `compute_table_stats` lands) — all
    * metadata-scale, zero data bytes. Served only on filterless,
    * delete-free scans, where the numbers exactly describe what the scan
    * emits; string/binary bounds additionally require the engine-writer
    * exactness stamp (foreign truncate(16) bounds are prefixes, not
    * values — the i71 rule applied to CBO). */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(planned._1.map(_._1.fileSizeInBytes).sum)
    override def numRows(): util.OptionalLong =
      if (planned._2.isEmpty && planned._3.isEmpty)
        util.OptionalLong.of(planned._1.map(_._1.recordCount).sum)
      else util.OptionalLong.empty()
    override def columnStats(): util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = colStatsMap
  }

  private lazy val colStatsMap: util.Map[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
    import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
    val m = new util.HashMap[NamedReference, ColumnStatistics]()
    if (filters.isEmpty && planned._2.isEmpty && planned._3.isEmpty &&
        planned._1.nonEmpty && !emptyTable) {
      val meta = pinnedMeta
      val exactMetrics = meta.properties.get("graft.metrics").contains("full")
      val statsDoc = {
        val snap = GraftTable.resolveForScan(meta, snapshotId, ref, asOfTimestampMs)
        // nearest-ANCESTOR document reached through only `replace`
        // snapshots: a replace rewrites files, not the rowset (spec
        // operation semantics), so after ingest → ANALYZE → compact the
        // document is still exact at the head — the CBO must not lose
        // its NDVs to a compaction (anchorIdx == 0 is the plain
        // exact-snapshot match). Per-field id lookups below keep a
        // snapshot-less ALTER between the anchor and the scan safe:
        // added fields simply have no entry.
        val statsBySnap = meta.statistics.map(s => s.snapshotId -> s).toMap
        val chain = Iterator.iterate(Option(snap))(
            _.flatMap(_.parentSnapshotId).flatMap(meta.snapshot))
          .takeWhile(_.isDefined).map(_.get).toSeq
        val anchorIdx = chain.indexWhere(s => statsBySnap.contains(s.snapshotId))
        if (anchorIdx < 0 ||
            !chain.take(anchorIdx).forall(_.operation.contains("replace"))) None
        else scala.util.Try(graft.iceberg.TableStats.read(
          statsBySnap(chain(anchorIdx).snapshotId).path)).toOption
      }
      val entries = planned._1.map(_._1)
      for (f <- required.fields if f.name != "_file" && f.name != "_pos" &&
          f.name != "_row_id" && f.name != "_last_updated_sequence_number") {
        meta.currentSchema.fields.find(_.name == f.name).foreach { field =>
          IcebergTypes.fromStringOpt(field.fieldType).foreach { t =>
            // float/double bounds are NaN-blind, string/binary bounds may
            // be truncated prefixes — same service gates as the stats-
            // served aggregate pushdown
            val boundsOk = t match {
              case IcebergTypes.TInt | IcebergTypes.TLong | IcebergTypes.TDate |
                  IcebergTypes.TTimestamp | IcebergTypes.TTimestamptz |
                  IcebergTypes.TDecimal(_, _) => true
              case IcebergTypes.TString => exactMetrics
              case _ => false
            }
            def decoded(get: ManifestWriter.EntryData => Option[Array[Byte]]): Seq[Any] =
              entries.map(e => get(e).filter(_.nonEmpty)
                .flatMap(b => scala.util.Try(SingleValueCodec.decode(t, b)).toOption)
                .flatMap(spjInternalValue(t, _))).map(_.orNull)
            def extreme(vals: Seq[Any], sign: Int): Option[Any] =
              // every kept file must carry the bound, or the true extreme
              // is unknowable from metadata
              if (vals.contains(null)) None
              else vals.reduceOption { (a, b) =>
                val c = (a, b) match {
                  case (x: Int, y: Int) => Integer.compare(x, y)
                  case (x: Long, y: Long) => java.lang.Long.compare(x, y)
                  case (x: org.apache.spark.unsafe.types.UTF8String,
                      y: org.apache.spark.unsafe.types.UTF8String) => x.compareTo(y)
                  case (x: org.apache.spark.sql.types.Decimal,
                      y: org.apache.spark.sql.types.Decimal) => x.compare(y)
                  case _ => 0
                }
                if (c * sign <= 0) a else b
              }
            val (mn, mx) =
              if (!boundsOk) (None, None)
              else (extreme(decoded(_.lowerBounds.get(field.id)), 1),
                extreme(decoded(_.upperBounds.get(field.id)), -1))
            val cs = statsDoc.flatMap(_.columns.get(field.id))
            if (mn.isDefined || mx.isDefined || cs.isDefined)
              m.put(Expressions.column(f.name), new ColumnStatistics {
                override def distinctCount(): util.OptionalLong =
                  cs.map(c => util.OptionalLong.of(c.ndv)).getOrElse(util.OptionalLong.empty())
                override def nullCount(): util.OptionalLong =
                  cs.flatMap(_.nullCount).map(util.OptionalLong.of)
                    .getOrElse(util.OptionalLong.empty())
                override def min(): java.util.Optional[Object] =
                  mn.map(v => java.util.Optional.of(v.asInstanceOf[Object]))
                    .getOrElse(java.util.Optional.empty())
                override def max(): java.util.Optional[Object] =
                  mx.map(v => java.util.Optional.of(v.asInstanceOf[Object]))
                    .getOrElse(java.util.Optional.empty())
              })
          }
        }
      }
    }
    m
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftTableReaderFactory(required, hadoopConf, columnarOk)
}

/** One SQL UPDATE / MERGE INTO execution: the scan and the write share
  * THIS instance, which is how the group set flows from planning to
  * commit (the scan's `onPlanned` records the files it served; the
  * write's commit swaps exactly those). Scan-level condition pushdown
  * keeps the rewrite proportional to the AFFECTED files — a pruned file
  * provably holds no matching row and carries forward untouched. */
class GraftRowLevelOperation(
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
    tableSchema: StructType, metadataPath: String, splitSize: Long,
    branch: Option[String] = None)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {

  private val scannedFiles =
    new java.util.concurrent.atomic.AtomicReference[Seq[String]](Nil)
  private val scannedDeletes =
    new java.util.concurrent.atomic.AtomicReference[Seq[String]](Nil)

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd

  /** `_file` must ride along: Spark only applies the ReplaceData row
    * projection (stripping its internal operation column before rows
    * reach the writer) when the operation declares metadata attributes —
    * and carrying the file also gives the rewrite its group identity. */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // the operation's scan plans against the BRANCH head when branch-
    // scoped — the same ref resolution any branch read uses
    new GraftTableScanBuilder(tableSchema, metadataPath, None, branch, None,
      splitSize, Some((paths, dels) => { scannedFiles.set(paths); scannedDeletes.set(dels) }))

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val delegate = new GraftTableWriteBuilder(metadataPath, info)
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write
            with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
          // task writers, distribution, and stat derivation come from the
          // ordinary write; only the COMMIT differs (replace, not append)
          private val inner = delegate.build()
            .asInstanceOf[org.apache.spark.sql.connector.write.Write
              with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]
          override def requiredDistribution()
              : org.apache.spark.sql.connector.distributions.Distribution =
            inner.requiredDistribution()
          override def requiredOrdering()
              : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
            inner.requiredOrdering()
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = {
            val appendLike = inner.toBatch
            new org.apache.spark.sql.connector.write.BatchWrite {
              override def createBatchWriterFactory(
                  pinfo: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
                  : org.apache.spark.sql.connector.write.DataWriterFactory =
                appendLike.createBatchWriterFactory(pinfo)
              override def commit(
                  messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
                val all = GraftTableWrites.filesOf(messages)
                val files = all.filter(_.rows > 0)
                val tableDir = new org.apache.hadoop.fs.Path(metadataPath).getParent.toString
                GraftTableWrites.drop(all.filter(_.rows == 0))
                GraftTable.commitReplaceFiles(tableDir,
                  files.map(m => GraftTable.PendingFile(
                    m.path, m.rows, m.bytes, m.lower, m.upper, m.summary, m.specId)),
                  scannedFiles.get().toSet, scannedDeletes.get().toSet, branch)
              }
              override def abort(
                  messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
                appendLike.abort(messages)
            }
          }
        }
    }
  }
}

/** The MERGE-ON-READ row-level operation (`SupportsDelta`): the scan
  * serves matching rows WITH their (_file, _pos) coordinates as the row
  * id, Spark routes each row's fate to the task DeltaWriters (delete →
  * buffered position delete; update → position delete + re-insert;
  * insert → data file), and the commit lands everything as ONE snapshot
  * at one sequence through `GraftTable.commitDeltaFiles` — which
  * re-validates inside the CAS loop that every file the deletes address
  * is still live, so a concurrent rewrite conflicts instead of silently
  * stranding deletes on dead paths. */
class GraftDeltaRowLevelOperation(
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
    tableSchema: StructType, metadataPath: String, splitSize: Long,
    branch: Option[String] = None)
    extends org.apache.spark.sql.connector.write.RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd

  private lazy val v3 =
    TableMetadata.parseFile(metadataPath).formatVersion >= 3

  /** v3 row lineage: the scan serves each matched row's _row_id as a
    * metadata attribute so UPDATE-written row versions can carry their
    * identity through (the delta writer materializes it). */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (v3) Array(org.apache.spark.sql.connector.expressions.Expressions.column("_row_id"))
    else Array.empty

  /** The row coordinate Iceberg position deletes address — served by the
    * scan as metadata columns, file-absolute across row-group splits. */
  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"),
      org.apache.spark.sql.connector.expressions.Expressions.column("_pos"))

  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftTableScanBuilder(tableSchema, metadataPath, None, branch, None, splitSize)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriteBuilder = {
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
        new org.apache.spark.sql.connector.write.DeltaWrite {
          override def toBatch(): org.apache.spark.sql.connector.write.DeltaBatchWrite = {
            val meta = TableMetadata.parseFile(metadataPath)
            val tableDir = new org.apache.hadoop.fs.Path(metadataPath).getParent.toString
            val fields = meta.currentSchema.fields.flatMap(f =>
              graft.iceberg.IcebergTypes.fromStringOpt(f.fieldType)
                .map(t => (f.id, f.name, t)))
            val spec = meta.partitionSpecs.find(_.specId == meta.defaultSpecId)
              .getOrElse(graft.iceberg.PartitionSpec(0, Nil))
            val BucketRe = """bucket\[(\d+)\]""".r
            val part: GraftTableWrites.PartInfo =
              if (spec.fields.isEmpty) None
              else Some((spec.specId, spec.fields.map { pf =>
                val f = meta.currentSchema.fields.find(_.id == pf.sourceId).get
                val t = graft.iceberg.IcebergTypes.fromString(f.fieldType)
                val out = pf.transform match {
                  case "identity" => t
                  case BucketRe(_) => graft.iceberg.IcebergTypes.TInt
                  case other => throw new IllegalArgumentException(
                    s"unsupported write transform '$other'")
                }
                (GraftTable.sparkSchema(meta).fieldIndex(f.name), t, pf.transform, out)
              }))
            new GraftTableDeltaBatchWrite(tableDir, GraftTable.sparkSchema(meta),
              fields, part,
              new graft.iceberg.SerializableHadoopConf(graft.iceberg.HadoopConfs.active()),
              carryLineage = meta.formatVersion >= 3, branch = branch)
          }
        }
    }
  }
}

class GraftTableDeltaBatchWrite(tableDir: String, schema: StructType,
    fields: Seq[(Int, String, graft.iceberg.IcebergType)],
    part: GraftTableWrites.PartInfo,
    hadoopConf: graft.iceberg.SerializableHadoopConf,
    carryLineage: Boolean = false, branch: Option[String] = None)
    extends org.apache.spark.sql.connector.write.DeltaBatchWrite {

  private val writeUuid = java.util.UUID.randomUUID().toString

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory =
    new GraftTableDeltaWriterFactory(tableDir, writeUuid, schema, fields, part,
      hadoopConf, carryLineage)

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val all = GraftTableWrites.filesOf(messages)
    val (dels, datas) = all.partition(_.content == 1)
    val dataLive = datas.filter(_.rows > 0)
    GraftTableWrites.drop(datas.filter(_.rows == 0))
    if (dels.isEmpty && dataLive.isEmpty) return // the operation matched nothing
    // conflict-validation targets: the exact file set the deletes address
    // (KB-scale — one distinct() over the per-task delete files)
    val targets =
      if (dels.isEmpty) Set.empty[String]
      else org.apache.spark.sql.SparkSession.active.read
        .parquet(dels.map(_.path): _*).select("file_path").distinct()
        .collect().map(_.getString(0)).toSet
    def pending(m: GraftFileMessage) = GraftTable.PendingFile(
      m.path, m.rows, m.bytes, m.lower, m.upper, m.summary, m.specId,
      carriesLineage = m.carriesLineage)
    GraftTable.commitDeltaFiles(tableDir,
      dataLive.map(pending), dels.map(pending), targets, branch)
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    GraftTableWrites.drop(GraftTableWrites.filesOf(messages))
}

class GraftTableDeltaWriterFactory(tableDir: String, writeUuid: String,
    schema: StructType, fields: Seq[(Int, String, graft.iceberg.IcebergType)],
    part: GraftTableWrites.PartInfo,
    hadoopConf: graft.iceberg.SerializableHadoopConf,
    carryLineage: Boolean = false)
    extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new GraftTableDeltaWriter(
      ord => s"$tableDir/data/w-$writeUuid-p%05d-t$taskId-f%03d.parquet"
        .format(partitionId, ord),
      s"$tableDir/data/del-$writeUuid-p%05d-t$taskId.parquet".format(partitionId),
      schema, fields, part, hadoopConf.value, carryLineage)
}

/** `rowGroup` == -1 reads the whole file (the un-split case); otherwise
  * exactly that row group, with `rowStart` its absolute first-row index
  * (what keeps file-absolute position deletes correct on a split).
  * `splitStart`/`splitBytes` are the split's BYTE range for the columnar
  * route (parquet selects row groups by midpoint): (0, Long.MaxValue)
  * covers the whole file; a row-group split carries the group's exact
  * footer-declared offset and compressed size. */
case class GraftTableInputPartition(filePath: String, sequenceNumber: Long,
    posDeleteFiles: Seq[String], eqDeleteFiles: Seq[String],
    tableSchema: StructType,
    // v3 deletion vectors addressing THIS file: (puffin path, blob
    // offset, blob length) straight from the manifest's field-143/144/
    // 145 triplet — the reader seeks to the bitmap, no footer read.
    // At most one per file in a well-formed v3 table; kept a Seq so a
    // malformed multi-DV table still reads correctly (union)
    dvRefs: Seq[(String, Long, Long)] = Nil,
    rowGroup: Int = -1, rowStart: Long = 0L,
    splitStart: Long = 0L, splitBytes: Long = Long.MaxValue,
    // RENAME COLUMN support: current name → the names this field's id
    // carried in earlier schemas; empty on never-renamed tables
    nameAlternates: Map[String, Seq[String]] = Map.empty,
    // manifest field 101: PARQUET (the engine's own writes) or AVRO
    // (foreign/imported data files — row route, no row-group splits)
    fileFormat: String = "PARQUET",
    // storage-partitioned joins: this file's partition tuple in catalyst
    // form (summary-derived), or null when the scan reported no
    // KeyGroupedPartitioning — Spark only calls partitionKey() after
    // grouping on a key-grouped report, where it is always present
    partitionKeyValues: Array[Any] = null,
    // v3 initial-defaults (external row domain) for columns a file may
    // predate — what the reader fills instead of null
    initialDefaults: Map[String, Any] = Map.empty,
    // v3 row lineage: this data file's first_row_id (manifest field 142)
    // — _row_id serves as firstRowId + pos; None when the file
    // materializes lineage as columns (or on pre-v3 tables)
    firstRowId: Option[Long] = None)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = {
    require(partitionKeyValues != null,
      s"partitionKey() on a non-key-grouped scan partition for $filePath")
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(partitionKeyValues)
  }
}

class GraftTableReaderFactory(required: StructType,
    hadoopConf: graft.iceberg.SerializableHadoopConf,
    columnar: Boolean = false) extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = columnar
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftTableInputPartition]
    p.fileFormat match {
      case "PARQUET" => new GraftTablePartitionReader(p, required, hadoopConf.value)
      case "AVRO" => new GraftTableAvroPartitionReader(p, required, hadoopConf.value)
      case "ORC" => new GraftTableOrcPartitionReader(p, required, hadoopConf.value)
      // position_deletes inspection partitions over v3 deletion vectors
      case "PUFFIN" => new GraftDvPosDeletesReader(p, required, hadoopConf.value)
      case other => throw new UnsupportedOperationException(
        s"unsupported data file format $other for ${p.filePath}")
    }
  }
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new GraftTableColumnarReader(
      partition.asInstanceOf[GraftTableInputPartition], required, hadoopConf.value)
}

/** The vectorized scan route: Spark's own VectorizedParquetRecordReader
  * decodes whole column batches (the engine's production parquet path —
  * dictionary-aware, null-vector schema evolution, no per-row object
  * materialization) and the scan exec consumes ColumnarBatches directly.
  * Selected whenever the scan carries NO pending deletes, no metadata
  * columns, and every required type is vectorizable — the overwhelmingly
  * common analytic case; anything else takes the row-route MOR reader.
  * This removes the 5-10× per-row Group-API decode penalty the round-8
  * reader paid on every SQL query through the catalog (ScanBench: 0.97×
  * native parquet vs 2.31× for the row route on full-width decode).
  *
  * The reader conf pins this library's OWN file conventions (micros
  * timestamps, CORRECTED datetime rebase) — every graft write route
  * produces exactly that. A FOREIGN file with INT64-nanos timestamps
  * would need the session's nanos handling instead; if such a table is
  * ever mounted, read it with `columnar=false` (the Group-API route
  * follows the file's declared logical types). */
class GraftTableColumnarReader(part: GraftTableInputPartition,
    required: StructType, confBase: Configuration)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport,
    VectorizedParquetRecordReader}
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

  /** Pending equality deletes, vectorized: each delete file's schema IS
    * its equality-column list; the parquet projection WIDENS to cover
    * columns the query never selects (the row route's rule, now batch-
    * side), the delete values load once per task into canonical-domain
    * sets, and the per-batch selection tests membership against the
    * batch's own vectors. Output batches expose only `required`. */
  private val eqColLists: Seq[Seq[String]] =
    part.eqDeleteFiles.map { del =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(del), confBase))
      try r.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSeq
      finally r.close()
    }.distinct

  private def tableType(name: String): DataType =
    part.tableSchema.fields.find(_.name == name).map(_.dataType).getOrElse(
      throw new IllegalArgumentException(s"equality column '$name' not in table schema"))

  private val extraFields: Seq[StructField] =
    eqColLists.flatten.distinct.filterNot(required.fieldNames.contains)
      .map(c => StructField(c, tableType(c)))
  private val widened = StructType(required.fields.toSeq ++ extraFields)

  /** RENAME COLUMN resolution on the columnar route: when the schema
    * history carries renames, a pre-rename file holds the OLD physical
    * name — requesting the current name would null-fill it. Spark's
    * reader clips the projection BY NAME, but the output ColumnarBatch
    * is purely positional, so substituting the file's own name for the
    * renamed field (same position, same type) reads the right vectors
    * with no downstream change. One extra KB-scale footer open, paid
    * ONLY by tables that have actually renamed a column. */
  private val requested: StructType =
    if (part.nameAlternates.isEmpty) widened
    else {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(part.filePath), confBase))
      val present = try r.getFileMetaData.getSchema.getFields.asScala
        .map(_.getName).toSet finally r.close()
      StructType(widened.fields.map { f =>
        if (present(f.name)) f
        else part.nameAlternates.getOrElse(f.name, Nil).find(present)
          .map(old => f.copy(name = old)).getOrElse(f)
      })
    }

  private val conf = new Configuration(confBase)
  // the keys Spark's reader stack expects its planner to have set
  conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, requested.json)
  conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
    classOf[ParquetReadSupport].getName)
  conf.setBoolean("spark.sql.parquet.binaryAsString", false)
  conf.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
  conf.setBoolean("spark.sql.caseSensitive", false)
  conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
  conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
  conf.setBoolean("spark.sql.parquet.fieldId.read.enabled", false)

  private val reader = new VectorizedParquetRecordReader(
    null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
  reader.initialize(
    new org.apache.hadoop.mapred.FileSplit(
      new org.apache.hadoop.fs.Path(part.filePath),
      part.splitStart, part.splitBytes, Array.empty[String]),
    new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID()))
  reader.initBatch(new StructType(), InternalRow.empty)
  reader.enableReturningBatches()

  /** Deleted FILE-ABSOLUTE row indexes addressing this file — empty on
    * the overwhelmingly common clean scan, which then pays nothing per
    * batch. The vectorized reader serves the split's rows strictly in
    * order with no predicate skipping, so the absolute index of a
    * batch's first row is `rowStart` plus the rows already served. */
  private val deleted =
    PosDeleteIndex.loadAll(part.posDeleteFiles, part.dvRefs, part.filePath, confBase)

  /** Equality-delete probes in the CANONICAL COLUMNAR domain — one per
    * distinct column list, specialized by shape so the per-row test
    * allocates NOTHING on the hot paths:
    *   - single long-coercible column (the CDC-upsert key shape):
    *     sorted `long[]` + binary search, fully unboxed;
    *   - single string column: a set of UTF8String keys probed with the
    *     vector's own transient UTF8String (no String materialization);
    *   - anything else: a tuple set probed through ONE reusable buffer
    *     (only the unavoidable value boxing remains).
    * This is what closed the eq-MOR ScanBench gap vs native parquet —
    * the previous per-row Array+Vector allocation was the entire cost. */
  private val eqProbes: Array[EqProbe] =
    EqDeleteIndex.load(part.eqDeleteFiles, tableType, confBase).map {
      case (cols, set) => EqProbe.build(
        cols.map(widened.fieldIndex).toArray, cols.map(tableType).toArray, set)
    }.toArray
  private val eqSetsEmpty: Boolean = eqProbes.isEmpty

  private var served: Long = 0L

  private var batch: ColumnarBatch = _
  override def next(): Boolean = {
    val has = reader.nextKeyValue()
    if (has) {
      val raw = reader.getCurrentValue.asInstanceOf[ColumnarBatch]
      val first = part.rowStart + served
      served += raw.numRows()
      batch =
        if (deleted.isEmpty && eqSetsEmpty && extraFields.isEmpty) raw
        else select(raw, first)
    }
    has
  }
  override def get(): ColumnarBatch = batch
  override def close(): Unit = reader.close()

  private def eqDeleted(raw: ColumnarBatch, row: Int): Boolean = {
    var i = 0
    while (i < eqProbes.length) {
      if (eqProbes(i).deleted(raw, row)) return true
      i += 1
    }
    false
  }

  /** Vectorized MOR: surviving ordinals map through a selection view over
    * the batch's own vectors — no column data is copied, deleted rows
    * simply vanish from the batch's row space (production Iceberg's
    * delete-aware vectorized read shape). A batch with no deleted rows
    * passes through untouched (modulo slicing off widened-only columns). */
  private def select(raw: ColumnarBatch, first: Long): ColumnarBatch = {
    val nReq = required.fields.length
    val n = raw.numRows()
    val sel = new Array[Int](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (!deleted.contains(first + i) && (eqSetsEmpty || !eqDeleted(raw, i))) {
        sel(k) = i; k += 1
      }
      i += 1
    }
    if (k == n) {
      if (extraFields.isEmpty) raw
      // slice off the widened-only columns; vectors wrap in close-shields
      // (the bases belong to the reader — see SelectedColumnVector.close)
      else new ColumnarBatch(
        Array.tabulate[ColumnVector](nReq)(c =>
          new ShieldedColumnVector(raw.column(c))), n)
    } else {
      val keep = java.util.Arrays.copyOf(sel, k)
      val cols = Array.tabulate[ColumnVector](nReq)(c =>
        new SelectedColumnVector(raw.column(c), keep))
      new ColumnarBatch(cols, k)
    }
  }
}

/** A per-row equality-delete membership test over a ColumnarBatch,
  * shape-specialized so the hot path allocates nothing (see the
  * construction notes at the reader's `eqProbes`). */
private[sources] sealed trait EqProbe {
  def deleted(raw: org.apache.spark.sql.vectorized.ColumnarBatch, row: Int): Boolean
}

private[sources] object EqProbe {
  import org.apache.spark.sql.vectorized.ColumnarBatch

  /** Single long-coercible key (int/long/date/timestamp vectors all
    * surface as int/long): sorted array + binary search, unboxed. */
  private final class LongCol(idx: Int, isInt: Boolean, sorted: Array[Long],
      hasNull: Boolean) extends EqProbe {
    override def deleted(raw: ColumnarBatch, row: Int): Boolean = {
      val v = raw.column(idx)
      if (v.isNullAt(row)) hasNull
      else {
        val x = if (isInt) v.getInt(row).toLong else v.getLong(row)
        java.util.Arrays.binarySearch(sorted, x) >= 0
      }
    }
  }

  /** Single string key: UTF8String set probed with the vector's own
    * transient UTF8String — hashing/equality run on the raw bytes, no
    * java.lang.String ever materializes. */
  private final class StringCol(idx: Int,
      set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String],
      hasNull: Boolean) extends EqProbe {
    override def deleted(raw: ColumnarBatch, row: Int): Boolean = {
      val v = raw.column(idx)
      if (v.isNullAt(row)) hasNull else set.contains(v.getUTF8String(row))
    }
  }

  /** Array-backed tuple with value-based hash/equality — stored keys own
    * their arrays; the probe side reuses ONE buffer per probe object. */
  private[sources] final class TupleKey(val vals: Array[AnyRef]) {
    override def hashCode: Int = java.util.Arrays.hashCode(vals)
    override def equals(o: Any): Boolean = o match {
      case t: TupleKey => java.util.Arrays.equals(vals, t.vals)
      case _ => false
    }
  }

  private final class Generic(idxs: Array[Int], dts: Array[DataType],
      set: java.util.HashSet[TupleKey]) extends EqProbe {
    private val buf = new Array[AnyRef](idxs.length)
    private val probe = new TupleKey(buf)
    private def value(v: org.apache.spark.sql.vectorized.ColumnVector,
        dt: DataType, row: Int): AnyRef =
      if (v.isNullAt(row)) null
      else dt match {
        case IntegerType | DateType => Int.box(v.getInt(row))
        case LongType | TimestampType | TimestampNTZType => Long.box(v.getLong(row))
        case DoubleType => Double.box(v.getDouble(row))
        case FloatType => Float.box(v.getFloat(row))
        case BooleanType => Boolean.box(v.getBoolean(row))
        case StringType => v.getUTF8String(row).toString
        case other => throw new UnsupportedOperationException(
          s"equality comparison over $other on the columnar route")
      }
    override def deleted(raw: ColumnarBatch, row: Int): Boolean = {
      var j = 0
      while (j < idxs.length) {
        buf(j) = value(raw.column(idxs(j)), dts(j), row)
        j += 1
      }
      set.contains(probe)
    }
  }

  /** Build the best probe for a loaded value set (canonical columnar
    * domain — Int/Long/String as [[EqDeleteIndex.canonical]] decodes). */
  def build(idxs: Array[Int], dts: Array[DataType],
      set: java.util.HashSet[Vector[Any]]): EqProbe = {
    import scala.jdk.CollectionConverters._
    if (idxs.length == 1) dts(0) match {
      case IntegerType | DateType | LongType | TimestampType | TimestampNTZType =>
        val vs = set.asScala.map(_.head)
        val hasNull = vs.exists(_ == null)
        val sorted = vs.collect {
          case i: Int => i.toLong
          case l: Long => l
        }.toArray.sorted
        return new LongCol(idxs(0),
          dts(0) == IntegerType || dts(0) == DateType, sorted, hasNull)
      case StringType =>
        val vs = set.asScala.map(_.head)
        val hs = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
        vs.foreach {
          case s: String => hs.add(org.apache.spark.unsafe.types.UTF8String.fromString(s))
          case _ => ()
        }
        return new StringCol(idxs(0), hs, vs.exists(_ == null))
      case _ => ()
    }
    val hs = new java.util.HashSet[TupleKey]()
    set.asScala.foreach(v => hs.add(new TupleKey(v.map(_.asInstanceOf[AnyRef]).toArray)))
    new Generic(idxs, dts, hs)
  }
}

/** Task-local equality-delete value sets in the canonical COLUMNAR
  * domain (Int epoch days, Long micros, String — exactly what
  * ColumnVector getters hand back), one per distinct equality-column
  * list. Null equality values match null data values (the spec rule) —
  * `null` participates in the tuple. */
private[sources] object EqDeleteIndex {
  def load(eqDeleteFiles: Seq[String], tableType: String => DataType,
      conf: Configuration): Seq[(Seq[String], java.util.HashSet[Vector[Any]])] = {
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[Seq[String], java.util.HashSet[Vector[Any]]]
    eqDeleteFiles.foreach { del =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(del), conf))
      try {
        val full = r.getFileMetaData.getSchema
        val cols = full.getFields.asScala.map(_.getName).toSeq
        val set = acc.getOrElseUpdate(cols, new java.util.HashSet[Vector[Any]]())
        val io = new ColumnIOFactory().getColumnIO(full, full, false)
        var pages = r.readNextRowGroup()
        while (pages != null) {
          val rr = io.getRecordReader(pages, new GroupRecordConverter(full))
          var i = 0L
          while (i < pages.getRowCount) {
            val g = rr.read()
            set.add(cols.map(c => canonical(g, c, tableType(c))).toVector)
            i += 1
          }
          pages = r.readNextRowGroup()
        }
      } finally r.close()
    }
    acc.toSeq
  }

  /** Group-API decode into the canonical columnar domain — MUST mirror
    * [[GraftTableColumnarReader.eqValue]] exactly, or tuples never match. */
  private def canonical(g: Group, name: String, dt: DataType): Any = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{FLOAT => PFLOAT, INT32}
    val t = g.getType
    if (!t.containsField(name)) return null
    val i = t.getFieldIndex(name)
    if (g.getFieldRepetitionCount(i) == 0) return null
    dt match {
      case IntegerType | DateType => g.getInteger(i, 0)
      case LongType | TimestampType | TimestampNTZType =>
        // pre-widening delete files may carry the narrower physical
        t.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case INT32 => g.getInteger(i, 0).toLong
          case _ => g.getLong(i, 0)
        }
      case DoubleType =>
        t.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case PFLOAT => g.getFloat(i, 0).toDouble
          case _ => g.getDouble(i, 0)
        }
      case FloatType => g.getFloat(i, 0)
      case BooleanType => g.getBoolean(i, 0)
      case StringType => g.getBinary(i, 0).toStringUsingUTF8
      case other => throw new UnsupportedOperationException(
        s"equality comparison over $other on the columnar route")
    }
  }
}

/** A pass-through ColumnVector view whose only job is to SHIELD the
  * reader-owned base vector from a consumer's close() (Spark closes
  * batches it replaces; the reader reuses and closes its own vectors —
  * see [[SelectedColumnVector.close]]). */
private[sources] final class ShieldedColumnVector(
    base: org.apache.spark.sql.vectorized.ColumnVector)
    extends org.apache.spark.sql.vectorized.ColumnVector(base.dataType()) {
  override def close(): Unit = ()
  override def hasNull: Boolean = base.hasNull
  override def numNulls(): Int = base.numNulls()
  override def isNullAt(rowId: Int): Boolean = base.isNullAt(rowId)
  override def getBoolean(rowId: Int): Boolean = base.getBoolean(rowId)
  override def getByte(rowId: Int): Byte = base.getByte(rowId)
  override def getShort(rowId: Int): Short = base.getShort(rowId)
  override def getInt(rowId: Int): Int = base.getInt(rowId)
  override def getLong(rowId: Int): Long = base.getLong(rowId)
  override def getFloat(rowId: Int): Float = base.getFloat(rowId)
  override def getDouble(rowId: Int): Double = base.getDouble(rowId)
  override def getArray(rowId: Int): org.apache.spark.sql.vectorized.ColumnarArray =
    base.getArray(rowId)
  override def getMap(ordinal: Int): org.apache.spark.sql.vectorized.ColumnarMap =
    base.getMap(ordinal)
  override def getDecimal(rowId: Int, precision: Int, scale: Int): Decimal =
    base.getDecimal(rowId, precision, scale)
  override def getUTF8String(rowId: Int): org.apache.spark.unsafe.types.UTF8String =
    base.getUTF8String(rowId)
  override def getBinary(rowId: Int): Array[Byte] = base.getBinary(rowId)
  override def getChild(ordinal: Int): org.apache.spark.sql.vectorized.ColumnVector =
    base.getChild(ordinal)
}

/** A ColumnVector view that re-indexes rows through a selection array:
  * row `i` of the view is row `sel(i)` of the base vector. This is how
  * the columnar MOR route drops position-deleted rows without copying
  * column data. Children ([[getChild]]) are NOT remapped — safe for the
  * palette's array type (getArray returns base-space element slices) but
  * not for structs, whose final `getStruct` walks children by row-id;
  * structs are outside [[GraftTableColumnarReader.supportedSchema]]. */
private[sources] final class SelectedColumnVector(
    base: org.apache.spark.sql.vectorized.ColumnVector, sel: Array[Int])
    extends org.apache.spark.sql.vectorized.ColumnVector(base.dataType()) {
  /** MUST NOT propagate: the base vectors belong to the
    * VectorizedParquetRecordReader, which reuses them for every
    * subsequent batch and closes them in [[GraftTableColumnarReader.close]].
    * A consumer closing this view (Spark closes replaced batches) would
    * otherwise null the reader's arrays mid-scan. The view itself holds
    * no resources. */
  override def close(): Unit = ()
  override def hasNull: Boolean = base.hasNull
  override def numNulls(): Int = {
    var n = 0
    var i = 0
    while (i < sel.length) { if (base.isNullAt(sel(i))) n += 1; i += 1 }
    n
  }
  override def isNullAt(rowId: Int): Boolean = base.isNullAt(sel(rowId))
  override def getBoolean(rowId: Int): Boolean = base.getBoolean(sel(rowId))
  override def getByte(rowId: Int): Byte = base.getByte(sel(rowId))
  override def getShort(rowId: Int): Short = base.getShort(sel(rowId))
  override def getInt(rowId: Int): Int = base.getInt(sel(rowId))
  override def getLong(rowId: Int): Long = base.getLong(sel(rowId))
  override def getFloat(rowId: Int): Float = base.getFloat(sel(rowId))
  override def getDouble(rowId: Int): Double = base.getDouble(sel(rowId))
  override def getArray(rowId: Int): org.apache.spark.sql.vectorized.ColumnarArray =
    base.getArray(sel(rowId))
  override def getMap(ordinal: Int): org.apache.spark.sql.vectorized.ColumnarMap =
    base.getMap(sel(ordinal))
  override def getDecimal(rowId: Int, precision: Int, scale: Int): Decimal =
    base.getDecimal(sel(rowId), precision, scale)
  override def getUTF8String(rowId: Int): org.apache.spark.unsafe.types.UTF8String =
    base.getUTF8String(sel(rowId))
  override def getBinary(rowId: Int): Array[Byte] = base.getBinary(sel(rowId))
  override def getChild(ordinal: Int): org.apache.spark.sql.vectorized.ColumnVector =
    base.getChild(ordinal)
}

/** The combined position-delete state addressing one data file: v2
  * parquet-sourced positions (hash set) plus the v3 DELETION VECTOR
  * (Roaring bitmap, probed first — on a v3 table it is the only
  * populated side and the per-row cost is two array reads through the
  * bitmap's last-hit cache, no boxing). Union semantics: a table mid-
  * upgrade can carry both forms for one file and every position in
  * either is deleted. */
private[sources] final class PosDeletes(
    set: java.util.HashSet[java.lang.Long], dv: graft.iceberg.Roaring64) {
  val isEmpty: Boolean = set.isEmpty && (dv == null || dv.isEmpty)
  def contains(pos: Long): Boolean =
    (dv != null && dv.contains(pos)) || (!set.isEmpty && set.contains(pos))
}

/** Task-local position-delete index: the FILE-ABSOLUTE deleted row
  * indexes addressing ONE data file, loaded once per task from its
  * sequence-scoped, path-bound-scoped delete files. Shared by the row
  * and columnar MOR routes — both address the same coordinate system
  * (record order == row index, Iceberg's `pos`). */
private[sources] object PosDeleteIndex {

  /** Parquet position deletes + v3 deletion vectors as one probe. */
  def loadAll(posDeleteFiles: Seq[String], dvRefs: Seq[(String, Long, Long)],
      dataFilePath: String, conf: Configuration): PosDeletes = {
    val set = load(posDeleteFiles, dataFilePath, conf)
    val dv = dvRefs match {
      case Nil => null
      case Seq((p, off, len)) => graft.iceberg.DeletionVectors.read(p, off, len, conf)
      case many => // malformed multi-DV table: union, stay correct
        graft.iceberg.Roaring64.fromPositions(
          many.flatMap { case (p, off, len) =>
            graft.iceberg.DeletionVectors.read(p, off, len, conf).toArray }.toArray)
    }
    new PosDeletes(set, dv)
  }
  private def normPath(p: String): String = p.replaceFirst("^[a-z0-9+.-]+:(//)?", "")

  def load(posDeleteFiles: Seq[String], dataFilePath: String,
      conf: Configuration): java.util.HashSet[java.lang.Long] = {
    val set = new java.util.HashSet[java.lang.Long]()
    val me = normPath(dataFilePath)
    posDeleteFiles.foreach { del =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(del), conf))
      try {
        val full = r.getFileMetaData.getSchema
        val sel = full.getFields.asScala
          .filter(f => f.getName == "file_path" || f.getName == "pos")
        val req = new MessageType(full.getName, sel.asJava)
        r.setRequestedSchema(req)
        val io = new ColumnIOFactory().getColumnIO(req, full, false)
        var pages = r.readNextRowGroup()
        while (pages != null) {
          val rr = io.getRecordReader(pages, new GroupRecordConverter(req))
          var i = 0L
          while (i < pages.getRowCount) {
            val g = rr.read()
            if (normPath(g.getBinary("file_path", 0).toStringUsingUTF8) == me)
              set.add(g.getLong("pos", 0))
            i += 1
          }
          pages = r.readNextRowGroup()
        }
      } finally r.close()
    }
    set
  }
}

/** Task-local equality-delete value sets in the EXTERNAL ROW domain
  * (String / boxed primitives / LocalDate / Instant / LocalDateTime /
  * content-comparable byte sequences) — shared by the parquet ROW route
  * and the Avro/ORC partition readers, whose data decodes land in the
  * same domain. Delete files are always parquet (this engine writes
  * them); their columns canonicalize to the CURRENT name generation.
  * Byte arrays wrap content-comparable via [[RowEqDeletes.canon]] —
  * a raw Array[Byte] inside the tuple would compare by REFERENCE and
  * silently never match (the probe side must canonicalize too). */
private[sources] object RowEqDeletes {

  def canon(v: Any): Any = v match {
    case b: Array[Byte] => scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
    case x => x
  }

  def load(eqDeleteFiles: Seq[String], tableType: String => DataType,
      altToCurrent: Map[String, String], conf: Configuration)
      : Seq[(Seq[String], java.util.HashSet[Vector[Any]])] = {
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[Seq[String], java.util.HashSet[Vector[Any]]]
    eqDeleteFiles.foreach { del =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(del), conf))
      try {
        val full = r.getFileMetaData.getSchema
        val raw = full.getFields.asScala.map(_.getName).toSeq
        val cols = raw.map(c => altToCurrent.getOrElse(c, c))
        val set = acc.getOrElseUpdate(cols, new java.util.HashSet[Vector[Any]]())
        val io = new ColumnIOFactory().getColumnIO(full, full, false)
        var pages = r.readNextRowGroup()
        while (pages != null) {
          val rr = io.getRecordReader(pages, new GroupRecordConverter(full))
          var i = 0L
          while (i < pages.getRowCount) {
            val g = rr.read()
            set.add(raw.zip(cols).map { case (rc, cc) =>
              canon(decode(g, rc, tableType(cc))) }.toVector)
            i += 1
          }
          pages = r.readNextRowGroup()
        }
      } finally r.close()
    }
    acc.toSeq
  }

  /** Parquet Group decode of one delete-file value into the external row
    * domain — MUST mirror the data-side decodes (the parquet row
    * reader's valueOf, the Avro converter, the ORC vector decode) or
    * tuples never match. Delete files carry primitive key columns only. */
  private def decode(g: Group, name: String, dt: DataType): Any = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{FLOAT => PFLOAT, INT32, INT64}
    val t = g.getType
    if (!t.containsField(name)) return null
    val i = t.getFieldIndex(name)
    if (g.getFieldRepetitionCount(i) == 0) return null
    dt match {
      case IntegerType => g.getInteger(i, 0)
      case LongType =>
        t.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case INT32 => g.getInteger(i, 0).toLong // pre-widening file
          case _ => g.getLong(i, 0)
        }
      case DoubleType =>
        t.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case PFLOAT => g.getFloat(i, 0).toDouble
          case _ => g.getDouble(i, 0)
        }
      case FloatType => g.getFloat(i, 0)
      case BooleanType => g.getBoolean(i, 0)
      case StringType => g.getBinary(i, 0).toStringUsingUTF8
      case BinaryType => g.getBinary(i, 0).getBytes
      case DateType => java.time.LocalDate.ofEpochDay(g.getInteger(i, 0).toLong)
      case TimestampType =>
        val us = g.getLong(i, 0)
        java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L)
      case TimestampNTZType =>
        val us = g.getLong(i, 0)
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case dec: DecimalType =>
        t.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case INT32 => java.math.BigDecimal.valueOf(g.getInteger(i, 0).toLong, dec.scale)
          case INT64 => java.math.BigDecimal.valueOf(g.getLong(i, 0), dec.scale)
          case _ => new java.math.BigDecimal(
            new java.math.BigInteger(g.getBinary(i, 0).getBytes), dec.scale)
        }
      case other => throw new UnsupportedOperationException(
        s"equality-delete column type $other is not supported")
    }
  }
}

object GraftTableColumnarReader {
  private def vectorizable(dt: DataType, nested: Boolean): Boolean = dt match {
    case IntegerType | LongType | FloatType | DoubleType | BooleanType |
         StringType | BinaryType | DateType | TimestampType |
         TimestampNTZType => true
    case _: DecimalType => true
    // Spark's vectorized parquet reader decodes standard 3-level lists
    // natively (nested column vectors) — array<float> embedding scans
    // stay on the columnar route
    case ArrayType(elem, _) => vectorizable(elem, nested)
    // struct/map only when the caller says batches pass through RAW
    // (delete-free scans): ColumnVector.getStruct is final and walks
    // children by row-id, which the selection views cannot remap
    case st: StructType if nested =>
      st.fields.forall(f => vectorizable(f.dataType, nested))
    case MapType(kt, vt, _) if nested =>
      vectorizable(kt, nested) && vectorizable(vt, nested)
    case _ => false
  }
  def supportedSchema(s: StructType, allowNested: Boolean = false): Boolean =
    s.fields.forall(f => vectorizable(f.dataType, allowNested))

  /** Types whose values compare cleanly between a ColumnVector getter and
    * the Group-API decode of an equality-delete file — the gate for
    * keeping equality-delete scans on the columnar route. Binary (array
    * equality), decimal (two physicals) and nested types stay row-route. */
  def eqComparable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | FloatType | DoubleType | BooleanType |
         StringType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
}

/** Conservative bound-stat evaluation over a single manifest entry: can
  * the file's [lower, upper] interval for the filtered column contain a
  * matching row? Missing/undecodable bounds keep the file. */
object FileBoundsEval {

  private val ops = Set("EqualTo", "GreaterThan", "GreaterThanOrEqual",
    "LessThan", "LessThanOrEqual", "In", "IsNull", "IsNotNull", "And", "Or", "Not")

  def supported(f: sources.Filter, schema: StructType): Boolean =
    ops.contains(f.getClass.getSimpleName) &&
      f.references.forall(r => schema.fieldNames.contains(r))

  /** True only when the entry PROVABLY holds no matching row. */
  def skippable(f: sources.Filter, e: ManifestWriter.EntryData, meta: TableMetadata): Boolean = {
    def bound(col: String, lower: Boolean): Option[Any] = for {
      field <- meta.currentSchema.fields.find(_.name == col)
      t <- IcebergTypes.fromStringOpt(field.fieldType)
      bytes <- (if (lower) e.lowerBounds else e.upperBounds).get(field.id)
      if bytes.nonEmpty
      v <- scala.util.Try(SingleValueCodec.decode(t, bytes)).toOption
    } yield v
    def cmpLo(col: String, v: Any): Option[Int] =
      bound(col, lower = true).flatMap(lo => EntryFilterEval.cmp(Some(lo), v))
    def cmpHi(col: String, v: Any): Option[Int] =
      bound(col, lower = false).flatMap(hi => EntryFilterEval.cmp(Some(hi), v))
    f match {
      case sources.EqualTo(c, v) =>
        cmpLo(c, v).exists(_ > 0) || cmpHi(c, v).exists(_ < 0)
      case sources.GreaterThan(c, v) => cmpHi(c, v).exists(_ <= 0)
      case sources.GreaterThanOrEqual(c, v) => cmpHi(c, v).exists(_ < 0)
      case sources.LessThan(c, v) => cmpLo(c, v).exists(_ >= 0)
      case sources.LessThanOrEqual(c, v) => cmpLo(c, v).exists(_ > 0)
      case sources.In(c, vs) =>
        vs.nonEmpty && vs.forall(v => skippable(sources.EqualTo(c, v), e, meta))
      case sources.And(l, r) => skippable(l, e, meta) || skippable(r, e, meta)
      case sources.Or(l, r) => skippable(l, e, meta) && skippable(r, e, meta)
      case _ => false
    }
  }
}

/** Streams one data file through parquet's Group API with column
  * projection, applying its position AND equality deletes task-locally.
  * Row index == record order: the reader decodes every row group in file
  * order with no predicate skipping, the same coordinate system
  * `_metadata.row_index` (and Iceberg's `pos`) addresses. Equality
  * deletes load once per task into value sets keyed by the delete file's
  * own column list (its schema IS the equality ids), and rows whose
  * tuple is in a set are skipped — null matches null, the spec's rule.
  * The parquet projection widens to cover the equality columns even when
  * the query never selects them; output rows stay on `required`. */
class GraftTablePartitionReader(part: GraftTableInputPartition,
    required: StructType, conf: Configuration) extends PartitionReader[InternalRow] {

  private def open(path: String): ParquetFileReader =
    ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), conf))

  /** Old-name → current-name map after RENAME COLUMN (empty otherwise). */
  private val altToCurrent: Map[String, String] =
    part.nameAlternates.flatMap { case (cur, as) => as.map(_ -> cur) }

  /** Projection = the file's own fields restricted to the required
    * columns (requested schemas must structurally match the file); a
    * required column the file predates null-fills in [[rowOf]]. A
    * RENAMED column selects under the name generation the file carries.
    * An empty projection (count(*), or all-columns-evolved) still needs
    * one field to drive row iteration. */
  private def projected(full: MessageType, names: Seq[String]): MessageType = {
    val wanted = names.flatMap(n => n +: part.nameAlternates.getOrElse(n, Nil)).toSet
    val sel = full.getFields.asScala.filter(f => wanted.contains(f.getName))
    new MessageType(full.getName, (if (sel.nonEmpty) sel else full.getFields.asScala.take(1)).asJava)
  }

  /** Deleted row indexes addressing THIS file, loaded once per task from
    * the sequence-scoped, path-bound-scoped delete files (Iceberg's
    * task-local delete apply; [[PosDeleteIndex]] — shared with the
    * columnar route). */
  private val deleted: PosDeletes =
    PosDeleteIndex.loadAll(part.posDeleteFiles, part.dvRefs, part.filePath, conf)

  private def tableType(name: String): DataType =
    part.tableSchema.fields.find(_.name == name).map(_.dataType).getOrElse(
      throw new IllegalArgumentException(s"equality column '$name' not in table schema"))

  /** Equality-delete value sets, one per distinct column list — loaded
    * once per task via the shared [[RowEqDeletes]] loader (Iceberg's
    * task-local eq-delete apply): values in the external row domain,
    * byte arrays content-comparable, names canonicalized to the current
    * generation; a null equality value matches a null data value. */
  private val eqSets: Seq[(Seq[String], java.util.HashSet[Vector[Any]])] =
    RowEqDeletes.load(part.eqDeleteFiles, tableType, altToCurrent, conf)

  // ------------------------------------------------------- the data file
  // Low-level row-group iteration: a split partition (rowGroup >= 0)
  // skips straight to its group and reads ONLY it; the un-split case
  // streams every group. `rowIndex` stays FILE-absolute (rowStart is the
  // split's first-row index), which is what position deletes address.
  private val dataReader = open(part.filePath)
  private val dataFull = dataReader.getFileMetaData.getSchema
  private val dataReq = projected(dataFull,
    (required.fieldNames.toSeq ++ eqSets.flatMap(_._1)).distinct)
  dataReader.setRequestedSchema(dataReq)
  private val dataIO = new ColumnIOFactory().getColumnIO(dataReq, dataFull, false)
  if (part.rowGroup > 0) (0 until part.rowGroup).foreach(_ => dataReader.skipNextRowGroup())
  private var pages = dataReader.readNextRowGroup()
  private var recordReader =
    if (pages == null) null else dataIO.getRecordReader(pages, new GroupRecordConverter(dataReq))
  private var remaining: Long = if (pages == null) 0L else pages.getRowCount
  private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(required)
  private var rowIndex: Long = part.rowStart - 1
  private var current: InternalRow = _

  /** Next raw record, crossing row-group boundaries in the un-split case;
    * null at end of the split/file. */
  private def advance(): Group = {
    if (remaining == 0) {
      if (part.rowGroup >= 0) return null // a split reads exactly one group
      pages = dataReader.readNextRowGroup()
      if (pages == null) return null
      recordReader = dataIO.getRecordReader(pages, new GroupRecordConverter(dataReq))
      remaining = pages.getRowCount
      return advance()
    }
    remaining -= 1
    recordReader.read()
  }

  private def valueOf(g: Group, name: String, dt: DataType): Any = {
    val t = g.getType
    // resolve the file's own name generation (RENAME COLUMN); a column
    // absent under every historical name predates the field: fill the
    // v3 initial-default if the schema declares one, else null
    val actual =
      if (t.containsField(name)) name
      else part.nameAlternates.getOrElse(name, Nil).find(t.containsField) match {
        case Some(old) => old
        case None => return part.initialDefaults.get(name).orNull
      }
    val i = t.getFieldIndex(actual)
    if (g.getFieldRepetitionCount(i) == 0) return null
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{FLOAT => PFLOAT, INT32}
    dt match {
      case IntegerType => g.getInteger(i, 0)
      case LongType =>
        // type-widening evolution: pre-widening files keep INT32 — the
        // declared long schema promotes the narrower physical losslessly
        t.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case INT32 => g.getInteger(i, 0).toLong
          case _ => g.getLong(i, 0)
        }
      case DoubleType =>
        t.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case PFLOAT => g.getFloat(i, 0).toDouble
          case _ => g.getDouble(i, 0)
        }
      case FloatType => g.getFloat(i, 0)
      case BooleanType => g.getBoolean(i, 0)
      case StringType => g.getBinary(i, 0).toStringUsingUTF8
      case BinaryType => g.getBinary(i, 0).getBytes
      case DateType => java.time.LocalDate.ofEpochDay(g.getInteger(i, 0).toLong)
      case TimestampType =>
        val us = g.getLong(i, 0)
        java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L)
      case TimestampNTZType =>
        val us = g.getLong(i, 0)
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case dec: DecimalType =>
        // physical encoding varies by writer: our task writers land
        // FIXED_LEN_BYTE_ARRAY (the Iceberg mapping); Spark-written
        // rewrite files use INT32/INT64 for small precision
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
        t.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case INT32 => java.math.BigDecimal.valueOf(g.getInteger(i, 0).toLong, dec.scale)
          case INT64 => java.math.BigDecimal.valueOf(g.getLong(i, 0), dec.scale)
          case _ => new java.math.BigDecimal(
            new java.math.BigInteger(g.getBinary(i, 0).getBytes), dec.scale)
        }
      case ArrayType(elem, _) =>
        // 3-level list decode (LIST > repeated "list"/"array"/... >
        // single child) — both our task writers and Spark's native
        // writer produce this layout; embedding columns read here when
        // the scan needs the row route (MOR, metadata columns). Element
        // decode recurses through valueOf, so nested elements
        // (array<struct>, array<array<...>>) come free.
        val outer = g.getGroup(i, 0)
        val n = outer.getFieldRepetitionCount(0)
        (0 until n).map { j =>
          val lg = outer.getGroup(0, j)
          valueOf(lg, lg.getType.getFieldName(0), elem)
        }
      case st: StructType =>
        // plain parquet group — external Row, CatalystTypeConverters
        // handles the rest (same contract as every other branch)
        val sub = g.getGroup(i, 0)
        org.apache.spark.sql.Row.fromSeq(
          st.fields.toSeq.map(f => valueOf(sub, f.name, f.dataType)))
      case MapType(kt, vt, _) =>
        // standard parquet MAP (MAP > repeated key_value > key, value)
        val outer = g.getGroup(i, 0)
        val n = outer.getFieldRepetitionCount(0)
        (0 until n).map { j =>
          val kv = outer.getGroup(0, j)
          valueOf(kv, "key", kt) -> valueOf(kv, "value", vt)
        }.toMap
      case org.apache.spark.sql.types.VariantType =>
        // the unshredded variant group: (metadata, value) binary halves
        // reassemble into the runtime VariantVal
        val sub = g.getGroup(i, 0)
        new org.apache.spark.unsafe.types.VariantVal(
          sub.getBinary("value", 0).getBytes,
          sub.getBinary("metadata", 0).getBytes)
      case other => throw new UnsupportedOperationException(
        s"graft-table reader does not decode $other (column $name) — " +
          "read via GraftTable.read for full-type support")
    }
  }

  /** Does the PHYSICAL file carry a materialized lineage column of this
    * name? (Rewrites materialize moved rows' ids — see GraftTable
    * lineage docs.) */
  private lazy val fileHasLineage: Set[String] =
    Seq(GraftTable.RowIdCol, GraftTable.LastUpdatedCol)
      .filter(dataFull.containsField).toSet

  private def rowOf(g: Group): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row.fromSeq(required.fields.toSeq.map { f =>
      f.name match {
        // metadata columns (SupportsMetadataColumns): served by the
        // reader, never decoded from the file
        case "_file" => part.filePath
        case "_pos" => rowIndex
        // v3 row lineage: the file's materialized column when a rewrite
        // carried ids, else first_row_id + pos; null on pre-v3 tables
        case GraftTable.RowIdCol
            if !part.tableSchema.fieldNames.contains(GraftTable.RowIdCol) =>
          if (fileHasLineage(GraftTable.RowIdCol))
            valueOf(g, GraftTable.RowIdCol, LongType)
          else part.firstRowId.map(_ + rowIndex).orNull
        case GraftTable.LastUpdatedCol
            if !part.tableSchema.fieldNames.contains(GraftTable.LastUpdatedCol) =>
          if (fileHasLineage(GraftTable.LastUpdatedCol))
            valueOf(g, GraftTable.LastUpdatedCol, LongType)
          // a file that carries _row_id but not _lus (delta UPDATE carry
          // files) still has lineage: its rows were last touched by the
          // commit that wrote it — the file's data sequence
          else if (part.firstRowId.isDefined ||
              fileHasLineage(GraftTable.RowIdCol)) part.sequenceNumber
          else null
        // the position_deletes metadata table's provenance column — the
        // PHYSICAL file each (file_path, pos) row came from; only when
        // the served schema doesn't carry a real column of that name
        case "delete_file_path"
            if !part.tableSchema.fieldNames.contains("delete_file_path") =>
          part.filePath
        case _ => valueOf(g, f.name, f.dataType)
      }
    })

  private def equalityDeleted(g: Group): Boolean =
    eqSets.exists { case (cols, set) =>
      set.contains(cols.map(c =>
        RowEqDeletes.canon(valueOf(g, c, tableType(c)))).toVector) }

  override def next(): Boolean = {
    var g = advance()
    rowIndex += 1
    while (g != null && (deleted.contains(rowIndex) || equalityDeleted(g))) {
      g = advance(); rowIndex += 1
    }
    if (g == null) false
    else { current = toCatalyst(rowOf(g)).asInstanceOf[InternalRow]; true }
  }

  override def get(): InternalRow = current

  override def close(): Unit = dataReader.close()
}
