package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.iceberg.AvroConversions

/** DataSource V2 connector for Iceberg manifest files:
  * `spark.read.format("graft-manifest").load(path, ...)`.
  *
  * The v2 upgrade of ManifestReader (SURVEY.md §7 M4 "optional DSv2"):
  * Catalyst now drives the scan — one InputPartition per manifest file
  * (Iceberg's own planning granularity), and column pruning
  * (`SupportsPushDownRequiredColumns`) is implemented as an Avro
  * reader-schema projection, so pruned fields are never even decoded
  * (the mechanism the reference exposes as `--reader-schema`,
  * ManifestFileReadTool.java:114-119,137-139).
  */
class ManifestDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"
  // nothing below is manifest-specific: the schema comes from the
  // container header, so this provider reads ANY Avro object-container
  // file (see AvroContainerDataSource for the generic-name registration)

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map(_.split(",").toSeq).getOrElse(Nil)
    val single = Option(options.get("path")).toSeq
    val all = (multi ++ single).filter(_.nonEmpty)
    require(all.nonEmpty, "graft-manifest requires a path")
    all
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val writer = graft.iceberg.ManifestReader.avroSchema(paths(options).head)
    AvroConversions.toStructType(writer)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ManifestTable(schema, paths(opts),
      graft.iceberg.ManifestReader.avroSchema(paths(opts).head).toString)
  }

  override def supportsExternalMetadata(): Boolean = false
}

/** Generic Avro container source: `spark.read.format("graft-avro")` — the
  * environment ships no spark-avro jar (SURVEY.md §7 constraints), so this
  * provider fills the gap for any Avro object-container file using the
  * core avro jar, with the same per-file partitioning and reader-schema
  * column pruning as the manifest source. */
class AvroContainerDataSource extends ManifestDataSource {
  override def shortName(): String = "graft-avro"
}

class ManifestTable(schema: StructType, paths: Seq[String], writerSchemaJson: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-manifest(${paths.mkString(",")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(schema, paths, writerSchemaJson)
}

class ManifestScanBuilder(fullSchema: StructType, paths: Seq[String], writerSchemaJson: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep Catalyst's pruned schema verbatim — including NESTED pruning
    // (e.g. data_file.file_path only); the reader derives a matching Avro
    // reader schema so skipped fields are never decoded
    required = requiredSchema

  override def build(): Scan = new ManifestScan(required, paths, writerSchemaJson)
}

class ManifestScan(required: StructType, paths: Seq[String], writerSchemaJson: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-manifest scan, ReadSchema: ${required.catalogString}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => ManifestInputPartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(required, writerSchemaJson)
}

case class ManifestInputPartition(path: String) extends InputPartition

class ManifestReaderFactory(required: StructType, writerSchemaJson: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ManifestPartitionReader(
      partition.asInstanceOf[ManifestInputPartition].path, required, writerSchemaJson)
}

/** Streams one manifest file; projection happens inside Avro decode via a
  * derived reader schema containing only the required top-level fields. */
class ManifestPartitionReader(path: String, required: StructType, writerSchemaJson: String)
    extends PartitionReader[InternalRow] {

  private val writerSchema = new Schema.Parser().parse(writerSchemaJson)
  private val readerSchema: Schema =
    AvroConversions.pruneAvroSchema(writerSchema, required)

  private val in = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(p.toUri, new Configuration())
    new java.io.BufferedInputStream(fs.open(p))
  }
  private val stream = new DataFileStream[GenericRecord](in,
    new GenericDatumReader[GenericRecord](writerSchema, readerSchema))
  private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(required)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (stream.hasNext) {
      val row = AvroConversions.toRow(readerSchema, stream.next())
      current = toCatalyst(row).asInstanceOf[InternalRow]
      true
    } else false

  override def get(): InternalRow = current

  override def close(): Unit = { stream.close(); in.close() }
}
