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

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[\s*(\d+)\s*\]""".r

  /** Parse an Iceberg primitive type string (e.g. "long", "decimal(9, 2)",
    * "fixed[16]"). Unknown strings throw — dropped-column lookups must be
    * handled by the caller (the reference NPEs here; we don't). */
  def fromString(s: String): IcebergType = s.trim match {
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
