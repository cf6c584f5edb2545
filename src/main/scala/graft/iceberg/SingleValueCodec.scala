package graft.iceberg

import java.math.BigInteger
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.util.UUID

import graft.iceberg.IcebergTypes._

/** Iceberg single-value binary (de)serialization, per the public Iceberg
  * spec "Appendix D: Single-value serialization". This is the decode the
  * reference delegates to `Conversions.fromByteBuffer`
  * (/root/reference/src/main/java/dev/liliwei/iceberg/tool/IcebergDatumWriter.java:195-197);
  * reimplemented because no iceberg jar ships here.
  *
  * Wire format: numerics little-endian (fixture-verified: long 1 =
  * `01 00 00 00 00 00 00 00`, see FIXTURES.md §2), strings UTF-8,
  * date = LE int days since epoch, time/timestamp = LE long micros,
  * uuid = 16 bytes big-endian, decimal = minimal big-endian two's-complement
  * unscaled value.
  */
object SingleValueCodec {

  def decode(t: IcebergType, bytes: Array[Byte]): Any = {
    if (bytes == null) return null
    def le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    t match {
      case TBoolean => bytes.nonEmpty && bytes(0) != 0
      case TInt => le.getInt
      case TLong =>
        // Iceberg may write an int-sized buffer for a long column whose
        // value fits in 32 bits (type promotion int→long).
        if (bytes.length == 4) le.getInt.toLong else le.getLong
      case TFloat => le.getFloat
      case TDouble =>
        if (bytes.length == 4) le.getFloat.toDouble else le.getDouble
      case TDate => LocalDate.ofEpochDay(le.getInt.toLong)
      case TTime => le.getLong
      case TTimestamp =>
        val us = le.getLong
        LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
      case TTimestamptz =>
        val us = le.getLong
        Instant.ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
      // v3 nanosecond timestamps: LE long nanos since epoch, surfaced as
      // the raw Long (their Spark shape — see IcebergTypes.TTimestampNs)
      case TTimestampNs | TTimestamptzNs => le.getLong
      case TString => new String(bytes, StandardCharsets.UTF_8)
      case TUuid =>
        val bb = ByteBuffer.wrap(bytes) // big-endian
        new UUID(bb.getLong, bb.getLong)
      case TBinary | TFixed(_) => bytes
      case TDecimal(_, scale) =>
        new java.math.BigDecimal(new BigInteger(bytes), scale)
      case TUnknown => throw new IllegalArgumentException(
        "unknown columns carry no values — no single-value serialization exists")
      // geo bounds are the spec's bounding-box corners: a WKB point per
      // bound (lower = min x/min y, upper = max x/max y). Non-point WKB
      // refuses inside pointCoord — a garbage bound must never decode.
      case _: TGeometry | _: TGeography =>
        GeoPoint(graft.functions.GeoAlgos.pointCoord(bytes, 0),
          graft.functions.GeoAlgos.pointCoord(bytes, 1))
    }
  }

  def encode(t: IcebergType, value: Any): Array[Byte] = {
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    t match {
      case TBoolean => Array(if (value.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
      case TInt => le(4).putInt(value.asInstanceOf[Int]).array()
      case TLong => le(8).putLong(value.asInstanceOf[Long]).array()
      case TFloat => le(4).putFloat(value.asInstanceOf[Float]).array()
      case TDouble => le(8).putDouble(value.asInstanceOf[Double]).array()
      case TDate => le(4).putInt(value.asInstanceOf[LocalDate].toEpochDay.toInt).array()
      case TTime => le(8).putLong(value.asInstanceOf[Long]).array()
      case TTimestamp =>
        val dt = value.asInstanceOf[LocalDateTime]
        le(8).putLong(dt.toEpochSecond(ZoneOffset.UTC) * 1000000L + dt.getNano / 1000L).array()
      case TTimestamptz =>
        val i = value.asInstanceOf[Instant]
        le(8).putLong(i.getEpochSecond * 1000000L + i.getNano / 1000L).array()
      case TTimestampNs | TTimestamptzNs =>
        le(8).putLong(value.asInstanceOf[Long]).array()
      case TString => value.toString.getBytes(StandardCharsets.UTF_8)
      case TUuid =>
        val u = value.asInstanceOf[UUID]
        ByteBuffer.allocate(16).putLong(u.getMostSignificantBits)
          .putLong(u.getLeastSignificantBits).array()
      case TBinary | TFixed(_) => value.asInstanceOf[Array[Byte]]
      case TDecimal(_, _) =>
        value.asInstanceOf[java.math.BigDecimal].unscaledValue.toByteArray
      case TUnknown => throw new IllegalArgumentException(
        "unknown columns carry no values — nothing to encode")
      case _: TGeometry | _: TGeography => value match {
        case GeoPoint(x, y) => graft.functions.GeoAlgos.pointWkb(x, y)
        case other => throw new IllegalArgumentException(
          s"${t.name} bounds encode from a GeoPoint bounding-box corner, " +
            s"got ${other.getClass.getSimpleName}")
      }
    }
  }

  /** Human-readable rendering of a decoded value, matching the reference's
    * display convention `value:<v>;type:<t>`
    * (/root/reference/src/main/java/dev/liliwei/iceberg/tool/IcebergDatumWriter.java:199-201,
    * README.md:16). */
  def render(t: IcebergType, bytes: Array[Byte]): String = {
    val v = decode(t, bytes) match {
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case GeoPoint(x, y) => s"POINT ($x $y)"
      case other => String.valueOf(other)
    }
    s"value:$v;type:${t.name}"
  }
}

/** A decoded geometry/geography bound: one bounding-box corner. Not a
  * scalar — deliberately incomparable, so the stats pruners' generic
  * `cmp` yields None and never mis-prunes on a geo column. */
final case class GeoPoint(x: Double, y: Double)
