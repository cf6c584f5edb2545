package graft.iceberg

import java.time.{Instant, LocalDate, LocalDateTime}
import java.util.UUID

import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.IcebergTypes._

class SingleValueCodecSpec extends AnyFunSuite {

  /** Plain-ScalaCheck sampling (scalatestplus bridge is not on the
    * dependency allowlist). */
  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    Iterator.continually(gen.sample).flatten.take(n).toSeq

  test("fixture anchor: long 1 is little-endian 01 00 00 00 00 00 00 00") {
    // Ground truth from the reference's golden manifest (FIXTURES.md §2).
    val bytes = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)
    assert(SingleValueCodec.decode(TLong, bytes) == 1L)
    assert(SingleValueCodec.encode(TLong, 1L).sameElements(bytes))
  }

  test("fixture anchor: string bound 'a' / 'b'") {
    assert(SingleValueCodec.decode(TString, Array[Byte](0x61)) == "a")
    assert(SingleValueCodec.decode(TString, Array[Byte](0x62)) == "b")
  }

  test("render matches reference display convention value:<v>;type:<t>") {
    assert(SingleValueCodec.render(TLong, Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)) == "value:1;type:long")
    assert(SingleValueCodec.render(TString, Array[Byte](0x61)) == "value:a;type:string")
  }

  test("int-width promotion: 4-byte buffer decodes as long (int→long evolution)") {
    assert(SingleValueCodec.decode(TLong, Array[Byte](2, 0, 0, 0)) == 2L)
  }

  test("roundtrip: int / long") {
    samples(Arbitrary.arbitrary[Int]).foreach { v =>
      assert(SingleValueCodec.decode(TInt, SingleValueCodec.encode(TInt, v)) == v)
    }
    samples(Arbitrary.arbitrary[Long]).foreach { v =>
      assert(SingleValueCodec.decode(TLong, SingleValueCodec.encode(TLong, v)) == v)
    }
  }

  test("roundtrip: float / double") {
    samples(Arbitrary.arbitrary[Float]).filterNot(_.isNaN).foreach { f =>
      assert(SingleValueCodec.decode(TFloat, SingleValueCodec.encode(TFloat, f)) == f)
    }
    samples(Arbitrary.arbitrary[Double]).filterNot(_.isNaN).foreach { d =>
      assert(SingleValueCodec.decode(TDouble, SingleValueCodec.encode(TDouble, d)) == d)
    }
  }

  test("roundtrip: string utf8") {
    samples(Arbitrary.arbitrary[String]).foreach { s =>
      assert(SingleValueCodec.decode(TString, SingleValueCodec.encode(TString, s)) == s)
    }
  }

  test("roundtrip: boolean") {
    assert(SingleValueCodec.decode(TBoolean, SingleValueCodec.encode(TBoolean, true)) == true)
    assert(SingleValueCodec.decode(TBoolean, SingleValueCodec.encode(TBoolean, false)) == false)
  }

  test("roundtrip: date") {
    samples(Gen.choose(-100000, 100000)).foreach { days =>
      val d = LocalDate.ofEpochDay(days.toLong)
      assert(SingleValueCodec.decode(TDate, SingleValueCodec.encode(TDate, d)) == d)
    }
  }

  test("roundtrip: timestamp / timestamptz micros") {
    samples(Gen.choose(-4102444800000000L, 4102444800000000L)).foreach { us =>
      val ntz = LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      assert(SingleValueCodec.decode(TTimestamp, SingleValueCodec.encode(TTimestamp, ntz)) == ntz)
      val tz = Instant.ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
      assert(SingleValueCodec.decode(TTimestamptz, SingleValueCodec.encode(TTimestamptz, tz)) == tz)
    }
  }

  test("roundtrip: uuid 16-byte big-endian") {
    samples(Gen.zip(Arbitrary.arbitrary[Long], Arbitrary.arbitrary[Long])).foreach { case (hi, lo) =>
      val u = new UUID(hi, lo)
      assert(SingleValueCodec.decode(TUuid, SingleValueCodec.encode(TUuid, u)) == u)
    }
  }

  test("roundtrip: decimal big-endian unscaled") {
    samples(Gen.choose(-1000000000L, 1000000000L)).foreach { unscaled =>
      val d = new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), 2)
      val t = TDecimal(18, 2)
      assert(SingleValueCodec.decode(t, SingleValueCodec.encode(t, d)) == d)
    }
  }

  test("type parsing: decimal / fixed shapes") {
    assert(IcebergTypes.fromString("decimal(9, 2)") == TDecimal(9, 2))
    assert(IcebergTypes.fromString("decimal(38,10)") == TDecimal(38, 10))
    assert(IcebergTypes.fromString("fixed[16]") == TFixed(16))
    assert(IcebergTypes.fromStringOpt("struct<...>").isEmpty)
  }

  test("nested type JSON: struct/map/list round-trip through name/fromString") {
    // the canonical JSON object forms table metadata carries — the
    // serialized `name` must parse back to the identical type tree
    val struct = IcebergTypes.TStruct(Seq(
      (10, "source", false, TString),
      (11, "score", true, TDouble),
      (12, "tags", false, IcebergTypes.TList(13, TString))))
    assert(IcebergTypes.fromString(struct.name) == struct)
    val map = IcebergTypes.TMap(20, TString, 21, struct)
    assert(IcebergTypes.fromString(map.name) == map)
    val deep = IcebergTypes.TList(30, map, elementRequired = true)
    assert(IcebergTypes.fromString(deep.name) == deep)
    // spark-type projection mirrors the tree
    import org.apache.spark.sql.types._
    assert(struct.sparkType == StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("score", DoubleType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = true), nullable = true))))
    assert(map.sparkType ==
      MapType(StringType, struct.sparkType, valueContainsNull = true))
  }
}
