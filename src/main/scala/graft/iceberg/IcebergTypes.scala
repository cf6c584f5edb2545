package graft.iceberg

import org.apache.spark.sql.types._

/** Iceberg primitive type model: the type strings that appear in table
  * metadata (`fields[].type`) and drive statistic-bound decoding.
  *
  * Mirrors the semantics the reference reaches through
  * `Types.fromPrimitiveString` + `Conversions.fromByteBuffer`
  * (/root/reference/src/main/java/dev/liliwei/iceberg/tool/IcebergDatumWriter.java:194-202),
  * re-derived here from the public Iceberg spec (no iceberg jar ships in
  * this environment — SURVEY.md §7).
  */
sealed trait IcebergType {
  def name: String
  def sparkType: DataType
}

object IcebergTypes {
  case object TBoolean extends IcebergType { val name = "boolean"; val sparkType = BooleanType }
  case object TInt extends IcebergType { val name = "int"; val sparkType = IntegerType }
  case object TLong extends IcebergType { val name = "long"; val sparkType = LongType }
  case object TFloat extends IcebergType { val name = "float"; val sparkType = FloatType }
  case object TDouble extends IcebergType { val name = "double"; val sparkType = DoubleType }
  case object TDate extends IcebergType { val name = "date"; val sparkType = DateType }
  /** Microseconds since midnight; Spark has no TimeType → LongType. */
  case object TTime extends IcebergType { val name = "time"; val sparkType = LongType }
  case object TTimestamp extends IcebergType { val name = "timestamp"; val sparkType = TimestampNTZType }
  case object TTimestamptz extends IcebergType { val name = "timestamptz"; val sparkType = TimestampType }
  case object TString extends IcebergType { val name = "string"; val sparkType = StringType }
  case object TUuid extends IcebergType { val name = "uuid"; val sparkType = StringType }
  case object TBinary extends IcebergType { val name = "binary"; val sparkType = BinaryType }
  /** Iceberg v3 `variant`: semi-structured values in the binary variant
    * encoding Spark 4 and Iceberg v3 share — maps 1:1 onto Spark's
    * VariantType. Carries NO bound statistics (the spec defines no
    * variant ordering). */
  case object TVariant extends IcebergType {
    val name = "variant"; val sparkType = org.apache.spark.sql.types.VariantType
  }
  /** Iceberg v3 nanosecond timestamps. Spark has no nanosecond timestamp
    * type, so both surface as LongType nanos-since-epoch — the same shape
    * `spark.sql.legacy.parquet.nanosAsLong` gives native TIMESTAMP(NANOS)
    * parquet reads (graft.Sessions sets it), which means an imported
    * NANOS file and the declared column agree without any conversion.
    * Truncating to a micros TimestampType instead would silently lose
    * the three digits the type exists to carry. */
  case object TTimestampNs extends IcebergType {
    val name = "timestamp_ns"; val sparkType = LongType
  }
  case object TTimestamptzNs extends IcebergType {
    val name = "timestamptz_ns"; val sparkType = LongType
  }
  /** Iceberg v3 `unknown`: a column whose type could not be resolved —
    * always null by contract (the spec forbids writing non-null values),
    * no single-value serialization, no bounds. Maps to Spark's NullType,
    * which is exactly the always-null contract. */
  case object TUnknown extends IcebergType {
    val name = "unknown"; val sparkType = NullType
  }
  /** Iceberg v3 `geometry(C)` / `geography(C, A)`: WKB-encoded shapes
    * with an optional CRS (and edge-interpolation algorithm for
    * geography). v1 support here is the storage layer only: metadata
    * with geo columns parses, the payload surfaces as BinaryType WKB
    * bytes, and there are no bound stats (the spec's geo bounds are
    * bounding-box points, not single values — encode refuses loudly).
    * No geo functions and no DDL create path (Spark has no geometry
    * type to map from). */
  final case class TGeometry(crs: Option[String]) extends IcebergType {
    val name: String = crs.fold("geometry")(c => s"geometry($c)")
    val sparkType = BinaryType
  }
  final case class TGeography(crs: Option[String], algorithm: Option[String])
      extends IcebergType {
    val name: String = (crs, algorithm) match {
      case (Some(c), Some(a)) => s"geography($c, $a)"
      case (Some(c), None) => s"geography($c)"
      case _ => "geography"
    }
    val sparkType = BinaryType
  }
  final case class TFixed(len: Int) extends IcebergType {
    val name = s"fixed[$len]"; val sparkType = BinaryType
  }
  final case class TDecimal(precision: Int, scale: Int) extends IcebergType {
    val name = s"decimal($precision, $scale)"
    val sparkType = DecimalType(precision, scale)
  }
  /** Iceberg LIST type — the shape an LLM-data lakehouse stores
    * `array<float>` embedding columns in. `name` is the spec's canonical
    * JSON object form (what table metadata carries for nested types;
    * reference lattice parity: IcebergDatumWriter.java:124-180 handles
    * ARRAY the same way). Lists carry NO bound stats (like binary — an
    * element-wise order would mis-prune). */
  final case class TList(elementId: Int, element: IcebergType,
      elementRequired: Boolean = false) extends IcebergType {
    val name: String =
      s"""{"type":"list","element-id":$elementId,"element":${
        if (element.name.startsWith("{")) element.name
        else "\"" + element.name + "\""},"element-required":$elementRequired}"""
    val sparkType: DataType = ArrayType(element.sparkType, containsNull = !elementRequired)
  }

  private def nested(t: IcebergType): String =
    if (t.name.startsWith("{")) t.name else "\"" + t.name + "\""
  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Iceberg STRUCT type — how an LLM-data lakehouse stores typed
    * metadata (source, license, scores) next to the text column. `name`
    * is the spec's canonical JSON object form; nested field ids allocate
    * from the schema's shared sequence like list element ids. Structs
    * carry NO bound stats (no total order — same rule as binary/list).
    * Reference lattice parity: RECORD at IcebergDatumWriter.java:124-180. */
  final case class TStruct(fields: Seq[(Int, String, Boolean, IcebergType)])
      extends IcebergType {
    val name: String = fields.map { case (id, fname, req, t) =>
      s"""{"id":$id,"name":${jstr(fname)},"required":$req,"type":${nested(t)}}"""
    }.mkString("""{"type":"struct","fields":[""", ",", "]}")
    val sparkType: DataType = StructType(fields.map { case (_, fname, req, t) =>
      StructField(fname, t.sparkType, nullable = !req) })
  }

  /** Iceberg MAP type (canonical JSON object form). Keys are required by
    * the spec; maps carry NO bound stats. MAP parity:
    * IcebergDatumWriter.java:124-180. */
  final case class TMap(keyId: Int, key: IcebergType, valueId: Int,
      value: IcebergType, valueRequired: Boolean = false) extends IcebergType {
    val name: String =
      s"""{"type":"map","key-id":$keyId,"key":${nested(key)},""" +
        s""""value-id":$valueId,"value":${nested(value)},"value-required":$valueRequired}"""
    val sparkType: DataType =
      MapType(key.sparkType, value.sparkType, valueContainsNull = !valueRequired)
  }

  /** Spark column type → Iceberg type string — the CREATE-side mapping
    * (used by the SQL catalog and the `migrate` schema inference).
    * Nested types serialize as the spec's canonical JSON object forms
    * and allocate their nested ids from `nextId` (outer-first, the
    * Iceberg assignment order). SMALLINT/TINYINT promote to `int`
    * (Iceberg has no 8/16-bit integers — the Spark-Iceberg convention). */
  def fromSparkType(dt: DataType, nextId: () => Int): String = dt match {
    case IntegerType => "int"
    case ShortType | ByteType => "int"
    case LongType => "long"
    case StringType => "string"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case BinaryType => "binary"
    case org.apache.spark.sql.types.VariantType => "variant"
    case ArrayType(elem, containsNull) =>
      val elemId = nextId() // allocate BEFORE recursing: outer-first ids
      TList(elemId, fromString(fromSparkType(elem, nextId)),
        elementRequired = !containsNull).name
    case st: StructType =>
      // outer-first ids: every direct child claims its id before any
      // child's own nested types recurse (the Iceberg assignment order)
      val ids = st.fields.map(_ => nextId())
      TStruct(st.fields.toSeq.zip(ids.toSeq).map { case (f, id) =>
        (id, f.name, !f.nullable, fromString(fromSparkType(f.dataType, nextId)))
      }).name
    case MapType(kt, vt, valueContainsNull) =>
      val keyId = nextId()
      val valueId = nextId()
      TMap(keyId, fromString(fromSparkType(kt, nextId)),
        valueId, fromString(fromSparkType(vt, nextId)),
        valueRequired = !valueContainsNull).name
    case other => throw new UnsupportedOperationException(
      s"graft catalog does not support column type $other")
  }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[\s*(\d+)\s*\]""".r
  private val GeometryRe = """geometry\(\s*([^)]+?)\s*\)""".r
  private val GeographyRe = """geography\(\s*([^,)]+?)\s*(?:,\s*([^)]+?)\s*)?\)""".r

  /** Parse an Iceberg type string: primitives (e.g. "long",
    * "decimal(9, 2)", "fixed[16]") or the canonical JSON object form of
    * a nested type (list, struct, map). Unknown strings throw —
    * dropped-column lookups must be handled by the caller (the reference
    * NPEs here; we don't). */
  def fromString(s: String): IcebergType = if (s.trim.startsWith("{")) {
    // any malformed/unsupported nested form must surface as the same
    // IllegalArgumentException primitives throw — fromStringOpt callers
    // SKIP such fields (foreign tables may carry structs/maps or lists
    // missing element-id; NPEing on them would abort whole-table parses)
    val n = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"Unparseable Iceberg type: $s", e) }
    Option(n.get("type")).map(_.asText()) match {
      case Some("list") =>
        val el = Option(n.get("element")).getOrElse(
          throw new IllegalArgumentException(s"list type without element: $s"))
        val elemId = Option(n.get("element-id")).getOrElse(
          throw new IllegalArgumentException(s"list type without element-id: $s"))
        TList(elemId.asInt(),
          fromString(if (el.isTextual) el.asText() else el.toString),
          Option(n.get("element-required")).exists(_.asBoolean()))
      case Some("struct") =>
        val fs = Option(n.get("fields")).filter(_.isArray).getOrElse(
          throw new IllegalArgumentException(s"struct type without fields: $s"))
        val parsed = (0 until fs.size()).map { i =>
          val f = fs.get(i)
          def req(k: String) = Option(f.get(k)).getOrElse(
            throw new IllegalArgumentException(s"struct field missing $k: $s"))
          val t = req("type")
          (req("id").asInt(), req("name").asText(),
            Option(f.get("required")).exists(_.asBoolean()),
            fromString(if (t.isTextual) t.asText() else t.toString))
        }
        TStruct(parsed)
      case Some("map") =>
        def req(k: String) = Option(n.get(k)).getOrElse(
          throw new IllegalArgumentException(s"map type missing $k: $s"))
        def sub(k: String) = { val t = req(k)
          fromString(if (t.isTextual) t.asText() else t.toString) }
        TMap(req("key-id").asInt(), sub("key"), req("value-id").asInt(),
          sub("value"), Option(n.get("value-required")).exists(_.asBoolean()))
      case other => throw new IllegalArgumentException(
        s"Unknown Iceberg nested type: ${other.getOrElse("<none>")}")
    }
  } else s.trim match {
    case "boolean" => TBoolean
    case "int" | "integer" => TInt
    case "long" => TLong
    case "float" => TFloat
    case "double" => TDouble
    case "date" => TDate
    case "time" => TTime
    case "timestamp" => TTimestamp
    case "timestamptz" => TTimestamptz
    case "timestamp_ns" => TTimestampNs
    case "timestamptz_ns" => TTimestamptzNs
    case "unknown" => TUnknown
    case "geometry" => TGeometry(None)
    case GeometryRe(c) => TGeometry(Some(c.trim))
    case "geography" => TGeography(None, None)
    case GeographyRe(c, a) =>
      TGeography(Some(c.trim), Option(a).map(_.trim).filter(_.nonEmpty))
    case "string" => TString
    case "uuid" => TUuid
    case "binary" => TBinary
    case "variant" => TVariant
    case DecimalRe(p, sc) => TDecimal(p.toInt, sc.toInt)
    case FixedRe(l) => TFixed(l.toInt)
    case other => throw new IllegalArgumentException(s"Unknown Iceberg primitive type: $other")
  }

  /** Types the Iceberg spec introduces in format version 3 — creating a
    * table (or adding a column) with one of these on a v1/v2 table must
    * refuse at DDL time, or a foreign v2 reader meets a type it cannot
    * parse. Nested types are v3-only iff any component is. */
  def isV3Only(t: IcebergType): Boolean = t match {
    case TVariant | TTimestampNs | TTimestamptzNs | TUnknown => true
    case _: TGeometry | _: TGeography => true
    case TList(_, e, _) => isV3Only(e)
    case TStruct(fs) => fs.exists(f => isV3Only(f._4))
    case TMap(_, k, _, v, _) => isV3Only(k) || isV3Only(v)
    case _ => false
  }

  def fromStringOpt(s: String): Option[IcebergType] =
    try Some(fromString(s)) catch { case _: IllegalArgumentException => None }
}
