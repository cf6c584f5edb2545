package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.iceberg.{GraftTable, IcebergType, IcebergTypes, SingleValueCodec,
  TableMetadata}

/** The write half of the DSv2 `graft-table` route:
  * `df.write.format("graft-table").option("metadata", <path>).mode("append").save()`.
  *
  * Spark's native distributed write protocol drives it: every TASK
  * streams its rows into its own parquet file (parquet's example Group
  * writer — snappy, one file per task attempt, attempt-unique names so
  * speculative or retried attempts never collide), tracking per-column
  * min/max AS IT WRITES; the task's commit message carries (path, rows,
  * bytes, encoded bound stats). The DRIVER's commit lands ONE append
  * snapshot through the OptimisticCommit CAS loop — the same linear
  * history any concurrent GraftTable writer joins — with a manifest
  * whose entries carry the task-derived bounds, so files written through
  * Spark are immediately stats-prunable. Aborts delete the orphaned
  * task files. The CAS loop refreshes internally: writing against a
  * stale metadata document is safe (the commit re-derives sequence
  * numbers and carried manifests from the refreshed head).
  *
  * Partitioned tables refuse loudly (hidden-partition layout needs the
  * transform-space grouping GraftTable.append performs) — at 100 TB the
  * unpartitioned fast path is the bulk-ingest shape; partition-aware
  * DSv2 writes would add a `RequiresDistributionAndOrdering` clause. */
class GraftTableWriteBuilder(metadataPath: String, info: LogicalWriteInfo)
    extends WriteBuilder {

  /** (tableDir, table schema, (field id, name, type) triples) after the
    * shared validation — batch and streaming writes check the same
    * contract. */
  private def validated(): (String, StructType, Seq[(Int, String, IcebergType)]) = {
    val meta = TableMetadata.parseFile(metadataPath)
    require(meta.partitionSpecs.find(_.specId == meta.defaultSpecId)
        .forall(_.fields.isEmpty),
      "graft-table DSv2 writes support unpartitioned tables — use " +
        "GraftTable.append for hidden-partitioned layouts")
    val tableSchema = GraftTable.sparkSchema(meta)
    val given = info.schema().fieldNames.toSeq
    require(given == tableSchema.fieldNames.toSeq,
      s"schema mismatch: table has ${tableSchema.fieldNames.mkString(",")}, " +
        s"write has ${given.mkString(",")}")
    val tableDir = new org.apache.hadoop.fs.Path(metadataPath).getParent.toString
    val fields = meta.currentSchema.fields.flatMap(f =>
      IcebergTypes.fromStringOpt(f.fieldType).map(t => (f.id, f.name, t)))
    (tableDir, tableSchema, fields)
  }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val (tableDir, tableSchema, fields) = validated()
      new GraftTableBatchWrite(tableDir, tableSchema, fields,
        new graft.iceberg.SerializableHadoopConf(graft.iceberg.HadoopConfs.active()))
    }
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      val (tableDir, tableSchema, fields) = validated()
      new GraftTableStreamingWrite(tableDir, tableSchema, fields, info.queryId(),
        new graft.iceberg.SerializableHadoopConf(graft.iceberg.HadoopConfs.active()))
    }
  }
}

/** Streaming sink: `df.writeStream.format("graft-table")` — every
  * micro-batch (epoch) lands as ONE CAS-committed append snapshot whose
  * summary carries `streaming-query-epoch = <queryId>/<epochId>`. On an
  * epoch REPLAY (restart re-runs the last uncommitted-to-the-source
  * batch), the committed snapshot is found by that tag, the re-written
  * task files are deleted, and NO duplicate snapshot lands — the
  * exactly-once contract, per-epoch idempotent like Iceberg's own
  * streaming writer. Empty epochs commit nothing. */
class GraftTableStreamingWrite(tableDir: String, schema: StructType,
    fields: Seq[(Int, String, IcebergType)], queryId: String,
    hadoopConf: graft.iceberg.SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new GraftTableStreamingWriterFactory(tableDir, queryId, schema, fields, hadoopConf)

  private def drop(ms: Seq[GraftWriteMessage]): Unit =
    ms.foreach(m => graft.iceberg.HadoopConfs.fileSystemFor(m.path)
      .delete(new org.apache.hadoop.fs.Path(m.path), false))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.toSeq.map(_.asInstanceOf[GraftWriteMessage])
    val files = all.filter(_.rows > 0)
    val tag = s"$queryId/$epochId"
    val base = TableMetadata.parseFile(GraftTable.latestMetadataPath(tableDir))
    val replayed = base.snapshots.exists(
      _.summary.get("streaming-query-epoch").contains(tag))
    if (files.isEmpty || replayed) drop(all)
    else {
      GraftTable.commitAppendFiles(tableDir,
        files.map(m => (m.path, m.rows, m.bytes, m.lower, m.upper)),
        extraSummary = Map("streaming-query-epoch" -> tag))
      drop(all.filter(_.rows == 0))
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    drop(messages.toSeq.collect { case m: GraftWriteMessage => m })
}

class GraftTableStreamingWriterFactory(tableDir: String, queryId: String,
    schema: StructType, fields: Seq[(Int, String, IcebergType)],
    hadoopConf: graft.iceberg.SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new GraftTableDataWriter(
      s"$tableDir/data/w-$queryId-e$epochId-p%05d-t$taskId.parquet".format(partitionId),
      schema, fields, hadoopConf.value)
}

/** (field id, value domain) per written column — what the commit message
  * carries back to the driver. */
case class GraftWriteMessage(path: String, rows: Long, bytes: Long,
    lower: Map[Int, Array[Byte]], upper: Map[Int, Array[Byte]])
    extends WriterCommitMessage

class GraftTableBatchWrite(tableDir: String, schema: StructType,
    fields: Seq[(Int, String, IcebergType)],
    hadoopConf: graft.iceberg.SerializableHadoopConf) extends BatchWrite {

  private val writeUuid = java.util.UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftTableWriterFactory(tableDir, writeUuid, schema, fields, hadoopConf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.toSeq.map(_.asInstanceOf[GraftWriteMessage])
      .filter(_.rows > 0) // empty task partitions add no file
    GraftTable.commitAppendFiles(tableDir,
      files.map(m => (m.path, m.rows, m.bytes, m.lower, m.upper)))
    // files from empty partitions were still created — remove them
    messages.toSeq.map(_.asInstanceOf[GraftWriteMessage]).filter(_.rows == 0)
      .foreach(m => graft.iceberg.HadoopConfs.fileSystemFor(m.path)
        .delete(new org.apache.hadoop.fs.Path(m.path), false))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.toSeq.collect { case m: GraftWriteMessage => m }.foreach(m =>
      graft.iceberg.HadoopConfs.fileSystemFor(m.path)
        .delete(new org.apache.hadoop.fs.Path(m.path), false))
}

class GraftTableWriterFactory(tableDir: String, writeUuid: String,
    schema: StructType, fields: Seq[(Int, String, IcebergType)],
    hadoopConf: graft.iceberg.SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftTableDataWriter(
      s"$tableDir/data/w-$writeUuid-p%05d-t$taskId.parquet".format(partitionId),
      schema, fields, hadoopConf.value)
}

/** Per-task parquet writer: streams rows into one file, tracking
  * min/max per column inline (the stats Iceberg manifests carry — no
  * second derive pass over the written file, unlike the driver-side
  * append path). */
class GraftTableDataWriter(path: String, schema: StructType,
    fields: Seq[(Int, String, IcebergType)], conf: Configuration)
    extends DataWriter[InternalRow] {

  private val msgType: MessageType = {
    val ts = schema.fields.map { f =>
      val b = f.dataType match {
        case IntegerType => Types.optional(PrimitiveTypeName.INT32)
        case LongType => Types.optional(PrimitiveTypeName.INT64)
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT)
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case DateType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType())
        case TimestampType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case other => throw new UnsupportedOperationException(
          s"graft-table DSv2 writer does not encode $other (column ${f.name})")
      }
      b.named(f.name)
    }
    new MessageType("spark_schema",
      ts.toSeq.map(t => t: org.apache.parquet.schema.Type).asJava)
  }

  private val writer = ExampleParquetWriter.builder(
      HadoopOutputFile.fromPath(new org.apache.hadoop.fs.Path(path), conf))
    .withConf(conf).withType(msgType)
    .withCompressionCodec(CompressionCodecName.SNAPPY)
    .build()
  private val factory = new SimpleGroupFactory(msgType)
  private var rows = 0L
  // raw-domain min/max per column (Int/Long/Double/Float/Boolean/String;
  // DateType as epoch days, TimestampType as epoch micros)
  private val mins = Array.fill[Any](schema.fields.length)(null)
  private val maxs = Array.fill[Any](schema.fields.length)(null)

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Int) => x.compareTo(y)
    case (x: Long, y: Long) => x.compareTo(y)
    case (x: Double, y: Double) => x.compareTo(y)
    case (x: Float, y: Float) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => x.compareTo(y)
    case (x: String, y: String) => x.compareTo(y)
    case _ => 0
  }

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        val v: Any = f.dataType match {
          case IntegerType | DateType => row.getInt(i)
          case LongType | TimestampType => row.getLong(i)
          case DoubleType => row.getDouble(i)
          case FloatType => row.getFloat(i)
          case BooleanType => row.getBoolean(i)
          case StringType => row.getUTF8String(i).toString
          case other => throw new UnsupportedOperationException(other.toString)
        }
        v match {
          case x: Int => g.add(f.name, x)
          case x: Long => g.add(f.name, x)
          case x: Double => g.add(f.name, x)
          case x: Float => g.add(f.name, x)
          case x: Boolean => g.add(f.name, x)
          case x: String => g.add(f.name, Binary.fromString(x))
        }
        if (mins(i) == null || cmp(v, mins(i)) < 0) mins(i) = v
        if (maxs(i) == null || cmp(v, maxs(i)) > 0) maxs(i) = v
      }
    }
    writer.write(g)
    rows += 1
  }

  /** Raw tracked value → the Iceberg single-value-codec input domain. */
  private def encode(t: IcebergType, dt: DataType, v: Any): Array[Byte] = (dt, v) match {
    case (DateType, days: Int) =>
      SingleValueCodec.encode(t, java.time.LocalDate.ofEpochDay(days.toLong))
    case (TimestampType, us: Long) => t match {
      case IcebergTypes.TTimestamptz => SingleValueCodec.encode(t,
        java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L))
      case _ => SingleValueCodec.encode(t,
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC))
    }
    case _ => SingleValueCodec.encode(t, v)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    val bounds = fields.zipWithIndex.flatMap { case ((id, name, t), _) =>
      val i = schema.fieldIndex(name)
      (Option(mins(i)), Option(maxs(i))) match {
        case (Some(lo), Some(hi)) =>
          Seq((id, encode(t, schema.fields(i).dataType, lo),
            encode(t, schema.fields(i).dataType, hi)))
        case _ => Nil
      }
    }
    GraftWriteMessage(path, rows,
      graft.iceberg.HadoopConfs.fileSystemFor(path)
        .getFileStatus(new org.apache.hadoop.fs.Path(path)).getLen,
      bounds.map(b => b._1 -> b._2).toMap, bounds.map(b => b._1 -> b._3).toMap)
  }

  override def abort(): Unit = {
    writer.close()
    graft.iceberg.HadoopConfs.fileSystemFor(path)
      .delete(new org.apache.hadoop.fs.Path(path), false)
  }

  override def close(): Unit = ()
}
