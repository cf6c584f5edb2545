package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._

/** Row-route reader for AVRO data files — the format the reference
  * itself decodes (`ManifestFileReadTool.java:140`): a foreign Iceberg
  * table may mark entries `file_format = AVRO`, and the scan streams
  * them through Avro's object-container reader with the same semantics
  * the parquet row route provides:
  *
  *  - record order IS the position coordinate (`pos` / `_pos`), so
  *    position deletes apply by file-absolute index (shared
  *    [[PosDeleteIndex]]);
  *  - required columns resolve by name with RENAME COLUMN history and
  *    null-fill for pre-evolution files;
  *  - type widening promotes int→long / float→double losslessly;
  *  - date / timestamp-micros logical types decode into the external
  *    row domain the Catalyst converter expects;
  *  - equality deletes load through the shared [[RowEqDeletes]] sets
  *    (delete files are always parquet) and compare against the SAME
  *    external-domain values this reader decodes — a streaming upsert
  *    over an imported Avro table applies exactly like over parquet.
  *
  * Avro containers have no row-group index, so files never split —
  * per-file parallelism, the granularity Avro supports without
  * block-seeking. */
class GraftTableAvroPartitionReader(part: GraftTableInputPartition,
    required: StructType, conf: Configuration) extends PartitionReader[InternalRow] {
  import org.apache.avro.generic.{GenericDatumReader, GenericRecord}

  private val deleted =
    PosDeleteIndex.loadAll(part.posDeleteFiles, part.dvRefs, part.filePath, conf)

  private def tableType(name: String): DataType =
    part.tableSchema.fields.find(_.name == name).map(_.dataType).getOrElse(
      throw new IllegalArgumentException(s"equality column '$name' not in table schema"))

  private val eqSets: Seq[(Seq[String], java.util.HashSet[Vector[Any]])] =
    RowEqDeletes.load(part.eqDeleteFiles, tableType,
      part.nameAlternates.flatMap { case (cur, as) => as.map(_ -> cur) }, conf)

  private val in = new java.io.BufferedInputStream(
    graft.iceberg.HadoopConfs.fileSystemFor(part.filePath)
      .open(new org.apache.hadoop.fs.Path(part.filePath)))
  private val stream = new org.apache.avro.file.DataFileStream[GenericRecord](
    in, new GenericDatumReader[GenericRecord]())

  private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(required)
  private var rowIndex: Long = -1L
  private var current: InternalRow = _

  private def logicalName(s: org.apache.avro.Schema): Option[String] = {
    val unwrapped =
      if (s.getType == org.apache.avro.Schema.Type.UNION)
        s.getTypes.stream().filter(_.getType != org.apache.avro.Schema.Type.NULL)
          .findFirst().orElse(s)
      else s
    Option(unwrapped.getLogicalType).map(_.getName)
  }

  private def convert(v: AnyRef, dt: DataType, schema: org.apache.avro.Schema): Any =
    (v, dt) match {
      case (null, _) => null
      case (u: org.apache.avro.util.Utf8, StringType) => u.toString
      case (s: String, StringType) => s
      case (i: java.lang.Integer, IntegerType) => i
      case (i: java.lang.Integer, LongType) => i.longValue() // widened schema
      case (i: java.lang.Integer, DateType) =>
        java.time.LocalDate.ofEpochDay(i.longValue())
      case (l: java.lang.Long, LongType) => l
      case (l: java.lang.Long, TimestampType) =>
        java.time.Instant.ofEpochSecond(Math.floorDiv(l, 1000000L),
          Math.floorMod(l, 1000000L) * 1000L)
      case (l: java.lang.Long, TimestampNTZType) =>
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(l, 1000000L),
          (Math.floorMod(l, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case (f: java.lang.Float, FloatType) => f
      case (f: java.lang.Float, DoubleType) => f.doubleValue() // widened schema
      case (d: java.lang.Double, DoubleType) => d
      case (b: java.lang.Boolean, BooleanType) => b
      case (bb: java.nio.ByteBuffer, BinaryType) =>
        val dup = bb.duplicate(); val arr = new Array[Byte](dup.remaining())
        dup.get(arr); arr
      case (fixed: org.apache.avro.generic.GenericFixed, BinaryType) => fixed.bytes()
      case (other, want) => throw new UnsupportedOperationException(
        s"avro data reader cannot decode ${other.getClass.getName} " +
          s"(logical ${logicalName(schema).getOrElse("none")}) as $want")
    }

  private def valueOf(r: GenericRecord, name: String, dt: DataType): Any = {
    val schema = r.getSchema
    // the file's own name generation (RENAME COLUMN), else null-fill
    val actual =
      if (schema.getField(name) != null) name
      else part.nameAlternates.getOrElse(name, Nil)
        .find(schema.getField(_) != null).getOrElse(return null)
    convert(r.get(actual), dt, schema.getField(actual).schema())
  }

  private def rowOf(r: GenericRecord): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row.fromSeq(required.fields.toSeq.map { f =>
      f.name match {
        case "_file" => part.filePath
        case "_pos" => rowIndex
        case _ => valueOf(r, f.name, f.dataType)
      }
    })

  private def equalityDeleted(r: GenericRecord): Boolean =
    eqSets.exists { case (cols, set) =>
      set.contains(cols.map(c =>
        RowEqDeletes.canon(valueOf(r, c, tableType(c)))).toVector) }

  override def next(): Boolean = {
    while (stream.hasNext) {
      val rec = stream.next()
      rowIndex += 1
      if (!deleted.contains(rowIndex) &&
          (eqSets.isEmpty || !equalityDeleted(rec))) {
        current = toCatalyst(rowOf(rec)).asInstanceOf[InternalRow]
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = { stream.close(); in.close() }
}
