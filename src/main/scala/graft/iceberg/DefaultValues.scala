package graft.iceberg

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import graft.iceberg.IcebergTypes._

/** Iceberg v3 column defaults: the `initial-default` / `write-default`
  * schema-field attributes, serialized per the spec's JSON single-value
  * rules (numbers as numbers, decimal as its exact string, date as
  * `YYYY-MM-DD`, timestamps as ISO-8601 — with/without offset for
  * timestamptz/timestamp). Three codecs around one raw-JSON-string
  * representation (what [[IcebergField]] stores):
  *
  *  - `toJson`: an EXTERNAL-domain value (Int/Long/String/LocalDate/
  *     Instant/BigDecimal…) → the JSON text persisted in metadata;
  *  - `fromJson`: back to the external domain (what the row readers
  *     null-fill with and `lit()` lifts on the native route);
  *  - `sqlText`: the equivalent Spark SQL literal, what rides in the
  *     `CURRENT_DEFAULT`/`EXISTS_DEFAULT` StructField metadata so
  *     Spark's own INSERT default resolution applies the value.
  *
  * Only primitive types carry defaults here; anything else refuses
  * loudly at DDL time (never at read time). */
object DefaultValues {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def toJson(t: IcebergType, external: Any): String = (t, external) match {
    case (TBoolean, b: Boolean) => b.toString
    case (TInt, i: Int) => i.toString
    case (TLong, l: Long) => l.toString
    case (TFloat, f: Float) => f.toString
    case (TDouble, d: Double) => d.toString
    case (TDecimal(_, _), d: java.math.BigDecimal) =>
      mapper.writeValueAsString(d.toPlainString)
    case (TString, s: String) => mapper.writeValueAsString(s)
    case (TDate, d: LocalDate) =>
      mapper.writeValueAsString(d.format(DateTimeFormatter.ISO_LOCAL_DATE))
    case (TTimestamp, dt: LocalDateTime) =>
      mapper.writeValueAsString(dt.format(DateTimeFormatter.ISO_LOCAL_DATE_TIME))
    case (TTimestamptz, i: Instant) =>
      mapper.writeValueAsString(
        DateTimeFormatter.ISO_OFFSET_DATE_TIME.format(i.atOffset(ZoneOffset.UTC)))
    case _ => throw new UnsupportedOperationException(
      s"DEFAULT not supported for type $t (value ${Option(external).map(_.getClass)})")
  }

  def fromJson(t: IcebergType, json: String): Any = {
    val n = mapper.readTree(json)
    t match {
      case TBoolean => n.asBoolean
      case TInt => n.asInt
      case TLong => n.asLong
      case TFloat => n.asDouble.toFloat
      case TDouble => n.asDouble
      case TDecimal(_, s) => new java.math.BigDecimal(n.asText).setScale(s)
      case TString => n.asText
      case TDate => LocalDate.parse(n.asText)
      case TTimestamp => LocalDateTime.parse(n.asText)
      case TTimestamptz =>
        java.time.OffsetDateTime.parse(n.asText).toInstant
      case _ => throw new UnsupportedOperationException(s"DEFAULT not supported for type $t")
    }
  }

  /** Spark SQL literal text for the persisted default — what the
    * analyzer re-parses when an INSERT omits the column. */
  def sqlText(t: IcebergType, json: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val v = fromJson(t, json)
    t match {
      case TBoolean | TInt | TDouble => v.toString
      case TLong => s"CAST(${v.toString} AS BIGINT)"
      case TFloat => s"CAST(${v.toString} AS FLOAT)"
      case TDecimal(p, s) => s"CAST(${v.asInstanceOf[java.math.BigDecimal].toPlainString} AS DECIMAL($p, $s))"
      case TString => q(v.asInstanceOf[String])
      case TDate => s"DATE${q(v.toString)}"
      case TTimestamp =>
        s"TIMESTAMP_NTZ${q(v.asInstanceOf[LocalDateTime].format(DateTimeFormatter.ISO_LOCAL_DATE_TIME).replace('T', ' '))}"
      case TTimestamptz =>
        val dt = LocalDateTime.ofInstant(v.asInstanceOf[Instant], ZoneOffset.UTC)
        s"TIMESTAMP${q(dt.format(DateTimeFormatter.ISO_LOCAL_DATE_TIME).replace('T', ' ') + " UTC")}"
      case _ => throw new UnsupportedOperationException(s"DEFAULT not supported for type $t")
    }
  }

  /** Catalyst-internal literal value (what a connector `LiteralValue`
    * carries) → the external domain `toJson` expects. */
  def internalToExternal(dt: org.apache.spark.sql.types.DataType, v: Any): Any = {
    import org.apache.spark.sql.types._
    (dt, v) match {
      case (_, null) => null
      case (StringType, s: org.apache.spark.unsafe.types.UTF8String) => s.toString
      case (DateType, d: Int) => LocalDate.ofEpochDay(d.toLong)
      case (TimestampType, us: Long) =>
        Instant.ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
      case (TimestampNTZType, us: Long) =>
        LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
      case (_: DecimalType, d: org.apache.spark.sql.types.Decimal) => d.toJavaBigDecimal
      case (_, other) => other
    }
  }
}
