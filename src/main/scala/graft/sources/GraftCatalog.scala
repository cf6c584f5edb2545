package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Literal, Transform}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.iceberg.{GraftTable, HadoopConfs, IcebergField, IcebergSchema,
  OptimisticCommit, PartitionField, PartitionSpec, TableMetadata}

/** A Spark `TableCatalog` over graft tables — the piece that makes plain
  * SQL work end-to-end:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")
  *   CREATE TABLE graft.db.events (id BIGINT, name STRING)
  *     PARTITIONED BY (bucket(8, id))
  *   INSERT INTO graft.db.events SELECT ...
  *   DELETE FROM graft.db.events WHERE id = 7
  *   SELECT ... FROM graft.db.events
  *   ALTER TABLE graft.db.events ADD COLUMN note STRING
  * }}}
  *
  * Every statement lands on the same machinery the programmatic API
  * uses: CREATE → GraftTable.create under `<warehouse>/<ns...>/<name>`;
  * INSERT → the DSv2 write path (task-written files, inline bound stats,
  * CAS append snapshot; hidden-partitioned layouts included); DELETE →
  * `SupportsDelete` translating the pushed predicate into
  * GraftTable.deleteWhere's position-delete commit (merge-on-read, no
  * rewrite); SELECT → the DSv2 scan with its two-level pruning and
  * task-local MOR; ADD COLUMN → a CAS schema-evolution commit. Catalog
  * state is NOTHING but the table directories — concurrent engines
  * coordinate through the versioned metadata documents alone, exactly
  * the HadoopCatalog model. */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def tableDir(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/")

  override def tableExists(ident: Identifier): Boolean =
    OptimisticCommit.currentVersion(tableDir(ident)) > 0

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = (warehouse +: namespace.toSeq).mkString("/")
    val fs = HadoopConfs.fileSystemFor(dir)
    if (!fs.exists(new Path(dir))) Array.empty
    else fs.listStatus(new Path(dir)).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .filter(tableExists)
  }

  /** Metadata-table names resolvable as `<table>.<name>` (the Iceberg
    * identifier convention: `SELECT * FROM graft.db.t.snapshots`). */
  private val MetadataTableNames =
    Set("snapshots", "history", "refs", "metadata_log_entries", "manifests", "files")

  private def loadMetadataTable(ident: Identifier): Option[Table] = {
    if (ident.namespace().isEmpty || !MetadataTableNames.contains(ident.name())) return None
    val baseIdent = Identifier.of(ident.namespace().init, ident.namespace().last)
    if (!tableExists(baseIdent)) return None
    val spark = org.apache.spark.sql.SparkSession.active
    val meta = TableMetadata.parseFile(
      GraftTable.latestMetadataPath(tableDir(baseIdent)))
    import graft.iceberg.MetadataTables
    val df = ident.name() match {
      case "snapshots" => MetadataTables.snapshots(spark, meta)
      case "history" => MetadataTables.history(spark, meta)
      case "refs" => MetadataTables.refs(spark, meta)
      case "metadata_log_entries" => MetadataTables.metadataLog(spark, meta)
      case "manifests" =>
        val list = meta.currentSnapshot.flatMap(_.manifestList).getOrElse(
          throw new IllegalArgumentException("table has no current snapshot"))
        MetadataTables.manifests(spark, list)
      case "files" =>
        // built from the core entry fields OUR manifests carry (the
        // generic files table projects columns a reduced-schema manifest
        // lacks); one concurrent driver read per manifest, KB-scale
        import spark.implicits._
        val infos = meta.currentSnapshot.flatMap(_.manifestList).toSeq
          .flatMap(graft.iceberg.ManifestListReader.read)
        graft.iceberg.Par.inParallel(infos)(i =>
            (i, graft.iceberg.ManifestWriter.read(i.path)))
          .flatMap { case (i, es) => es.filter(_.status != 2).map(e =>
            (i.path, e.content, e.filePath, e.recordCount, e.fileSizeInBytes,
              e.sequenceNumber.getOrElse(i.sequenceNumber))) }
          .toDF("manifest_path", "content", "file_path", "record_count",
            "file_size_in_bytes", "sequence_number")
    }
    Some(new GraftLocalTable(s"$catalogName.${ident.toString}", df))
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) {
      loadMetadataTable(ident) match {
        case Some(t) => return t
        case None => throw new NoSuchTableException(ident)
      }
    }
    val metaPath = GraftTable.latestMetadataPath(tableDir(ident))
    new GraftSparkTable(GraftTable.sparkSchema(TableMetadata.parseFile(metaPath)),
      metaPath, None, None, None, 128L * 1024 * 1024)
  }

  /** SQL `VERSION AS OF <snapshot-id>` — the version string is the
    * snapshot id (Iceberg's convention). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val metaPath = GraftTable.latestMetadataPath(tableDir(ident))
    new GraftSparkTable(GraftTable.sparkSchema(TableMetadata.parseFile(metaPath)),
      metaPath, Some(version.toLong), None, None, 128L * 1024 * 1024)
  }

  /** SQL `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds since epoch;
    * snapshot-log resolution wants millis. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val metaPath = GraftTable.latestMetadataPath(tableDir(ident))
    new GraftSparkTable(GraftTable.sparkSchema(TableMetadata.parseFile(metaPath)),
      metaPath, None, None, Some(timestampMicros / 1000L), 128L * 1024 * 1024)
  }

  private def icebergTypeName(dt: DataType): String = dt match {
    case IntegerType => "int"
    case LongType => "long"
    case StringType => "string"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case other => throw new UnsupportedOperationException(
      s"graft catalog does not support column type $other")
  }

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(
      (ident.namespace() :+ ident.name()).toSeq)
    val fields = columns.toSeq.zipWithIndex.map { case (c, i) =>
      IcebergField(i + 1, c.name(), required = false, icebergTypeName(c.dataType()))
    }
    val idByName = fields.map(f => f.name -> f.id).toMap
    val specFields = partitions.toSeq.zipWithIndex.map { case (t, i) =>
      val refs = t.references()
      require(refs.length == 1 && refs.head.fieldNames().length == 1,
        s"unsupported partition reference in $t")
      val colName = refs.head.fieldNames().head
      val srcId = idByName.getOrElse(colName, throw new IllegalArgumentException(
        s"partition column $colName not in schema"))
      t.name() match {
        case "identity" =>
          PartitionField(s"${colName}_id", "identity", srcId, 1000 + i)
        case "bucket" =>
          val n = t.arguments().collectFirst {
            case l: Literal[_] => l.value().toString.toInt
          }.getOrElse(throw new IllegalArgumentException(s"bucket without N in $t"))
          PartitionField(s"${colName}_bucket", s"bucket[$n]", srcId, 1000 + i)
        case other => throw new UnsupportedOperationException(
          s"unsupported partition transform $other — supported: identity, bucket(N, col)")
      }
    }
    // fixed default timestamp keeps catalog DDL deterministic for the
    // oracle fixtures; real deployments pass commit-timestamp-ms
    val t0 = Option(properties.get("commit-timestamp-ms")).map(_.toLong)
      .getOrElse(1700000000000L)
    GraftTable.create(tableDir(ident), IcebergSchema(0, fields),
      tableUuid = java.util.UUID.randomUUID().toString, timestampMs = t0,
      spec = PartitionSpec(0, specFields))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "graft catalog supports top-level ADD COLUMN only")
        val base = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
        val cur = base.currentSchema
        val nextId = cur.fields.map(_.id).max + 1
        GraftTable.evolveSchema(dir, IcebergSchema(
          base.schemas.map(_.schemaId).max + 1,
          cur.fields :+ IcebergField(nextId, add.fieldNames().head,
            required = false, icebergTypeName(add.dataType()))))
      case other => throw new UnsupportedOperationException(
        s"unsupported table change $other — supported: ADD COLUMN")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && HadoopConfs.fileSystemFor(tableDir(ident))
      .delete(new Path(tableDir(ident)), true)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog does not rename tables (paths ARE the identity)")
}

/** A metadata table served as a V2 `LocalScan`: the rows are KB-scale
  * driver state (the same boundary the planner itself keeps), so Spark
  * executes them as a LocalTableScan — broadcast-friendly, no tasks. */
class GraftLocalTable(tableName: String, df: org.apache.spark.sql.DataFrame)
    extends Table with SupportsRead {
  private val tableSchema = df.schema
  private val collected: Array[org.apache.spark.sql.catalyst.InternalRow] = {
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(tableSchema)
    df.collect().map(conv(_).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
  }
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    () => new org.apache.spark.sql.connector.read.LocalScan {
      override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] = collected
      override def readSchema(): StructType = tableSchema
      override def description(): String = s"graft metadata table $tableName"
    }
}
