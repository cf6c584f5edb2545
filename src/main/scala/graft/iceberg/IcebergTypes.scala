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

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[\s*(\d+)\s*\]""".r

  /** Parse an Iceberg type string: primitives (e.g. "long",
    * "decimal(9, 2)", "fixed[16]") or the canonical JSON object form of
    * a nested type (currently `list`). Unknown strings throw —
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
    case "string" => TString
    case "uuid" => TUuid
    case "binary" => TBinary
    case DecimalRe(p, sc) => TDecimal(p.toInt, sc.toInt)
    case FixedRe(l) => TFixed(l.toInt)
    case other => throw new IllegalArgumentException(s"Unknown Iceberg primitive type: $other")
  }

  def fromStringOpt(s: String): Option[IcebergType] =
    try Some(fromString(s)) catch { case _: IllegalArgumentException => None }
}
