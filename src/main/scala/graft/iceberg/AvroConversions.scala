package graft.iceberg

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.GenericRecord
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro ⇄ Spark conversions for Iceberg manifest files.
  *
  * Replaces the reference's schema-directed tree walk
  * (/root/reference/src/main/java/dev/liliwei/iceberg/tool/IcebergDatumWriter.java:72-184)
  * with a one-time Avro-schema→StructType mapping plus a per-record
  * GenericRecord→Row conversion that runs inside executor tasks.
  *
  * Type mapping (SURVEY.md §1.4):
  *   - union ["null", T] → nullable T (Iceberg manifests only use null-unions);
  *   - Iceberg's map-as-array-of-k/v-records (`logicalType: map`,
  *     FIXTURES.md §2) → MapType(keyType, valueType);
  *   - bytes/fixed → BinaryType, enum → StringType;
  *   - Avro field-id props preserved in StructField metadata (field identity
  *     in Iceberg is by integer id, not name — SURVEY.md §1.3).
  */
object AvroConversions {

  val FieldIdKey = "field-id"

  private def isLogicalMap(s: Schema): Boolean =
    s.getType == Schema.Type.ARRAY && "map" == s.getProp("logicalType") &&
      s.getElementType.getType == Schema.Type.RECORD &&
      s.getElementType.getField("key") != null && s.getElementType.getField("value") != null

  /** Strip the null branch of a union; returns (branch, nullable). */
  private def unwrapUnion(s: Schema): (Schema, Boolean) =
    if (s.getType != Schema.Type.UNION) (s, false)
    else {
      val branches = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      if (branches.size == 1) (branches.head, true)
      else throw new UnsupportedOperationException(
        s"multi-branch unions are not used by Iceberg manifests: $s")
    }

  def toDataType(s: Schema): (DataType, Boolean) = {
    val (sch, nullable) = unwrapUnion(s)
    val dt: DataType = sch.getType match {
      case Schema.Type.RECORD => toStructType(sch)
      case Schema.Type.ARRAY if isLogicalMap(sch) =>
        val elem = sch.getElementType
        val (kt, _) = toDataType(elem.getField("key").schema())
        val (vt, vNullable) = toDataType(elem.getField("value").schema())
        MapType(kt, vt, vNullable)
      case Schema.Type.ARRAY =>
        val (et, eNullable) = toDataType(sch.getElementType)
        ArrayType(et, eNullable)
      case Schema.Type.MAP =>
        val (vt, vNullable) = toDataType(sch.getValueType)
        MapType(StringType, vt, vNullable)
      case Schema.Type.ENUM | Schema.Type.STRING => StringType
      case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG => LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.NULL => NullType
      case other => throw new UnsupportedOperationException(s"Avro type $other")
    }
    (dt, nullable)
  }

  def toStructType(record: Schema): StructType = StructType(
    record.getFields.asScala.map { f =>
      val (dt, nullable) = toDataType(f.schema())
      val md = Option(f.getProp(FieldIdKey)) match {
        case Some(id) => new MetadataBuilder().putLong(FieldIdKey, id.toLong).build()
        case None => Metadata.empty
      }
      StructField(f.name(), dt, nullable, md)
    }.toSeq)

  def toRowValue(s: Schema, v: Any): Any = {
    if (v == null) return null
    val (sch, _) = unwrapUnion(s)
    sch.getType match {
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(sch.getFields.asScala.map(f => toRowValue(f.schema(), rec.get(f.pos()))).toSeq)
      case Schema.Type.ARRAY if isLogicalMap(sch) =>
        val elem = sch.getElementType
        val (kf, vf) = (elem.getField("key"), elem.getField("value"))
        v.asInstanceOf[java.util.Collection[Any]].asScala.map { e =>
          val r = e.asInstanceOf[GenericRecord]
          toRowValue(kf.schema(), r.get(kf.pos())) -> toRowValue(vf.schema(), r.get(vf.pos()))
        }.toMap
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.map(toRowValue(sch.getElementType, _)).toSeq
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, mv) =>
          k.toString -> toRowValue(sch.getValueType, mv)
        }.toMap
      case Schema.Type.ENUM | Schema.Type.STRING => v.toString
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](bb.remaining())
        bb.duplicate().get(arr)
        arr
      case Schema.Type.FIXED =>
        v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes().clone()
      case _ => v match {
        case u: Utf8 => u.toString
        case other => other
      }
    }
  }

  def toRow(schema: Schema, record: GenericRecord): Row =
    toRowValue(schema, record).asInstanceOf[Row]

  /** Derive an Avro reader schema keeping only the fields of `required`,
    * recursively through nested records (and through null-unions). Feeding
    * this to Avro schema resolution makes nested column pruning happen at
    * decode time — skipped fields are never materialized. */
  def pruneAvroSchema(writer: Schema, required: StructType): Schema = {
    def pruneFieldSchema(w: Schema, dt: DataType): Schema = (w.getType, dt) match {
      case (Schema.Type.UNION, _) =>
        val branches = w.getTypes.asScala
        Schema.createUnion(branches.map { b =>
          if (b.getType == Schema.Type.NULL) b else pruneFieldSchema(b, dt)
        }.asJava)
      case (Schema.Type.RECORD, st: StructType) => pruneRecord(w, st)
      case _ => w
    }
    def pruneRecord(w: Schema, st: StructType): Schema = {
      val fields = st.fields.toSeq.map { rf =>
        val wf = Option(w.getField(rf.name)).getOrElse(
          throw new IllegalArgumentException(s"field ${rf.name} not in writer schema $w"))
        new Schema.Field(wf.name(), pruneFieldSchema(wf.schema(), rf.dataType), wf.doc(), wf.defaultVal())
      }
      Schema.createRecord(w.getName, w.getDoc, w.getNamespace, false, fields.asJava)
    }
    pruneRecord(writer, required)
  }
}
