package graft.iceberg

import org.scalatest.funsuite.AnyFunSuite

/** Pins PartitionTransforms against the Iceberg table-spec's own published
  * bucket-transform test vectors (spec Appendix B) plus the documented
  * truncate/temporal examples — the ground truth a real Iceberg reader
  * would hold our partition values to. */
class PartitionTransformsSpec extends AnyFunSuite {

  test("bucket hash matches the spec's published vectors") {
    // int/long 34 hash as the same 8-byte little-endian long
    assert(PartitionTransforms.hashLong(34L) == 2017239379)
    // date 2017-11-16 = 17486 epoch days, hashed as a long
    assert(PartitionTransforms.hashLong(17486L) == -653330422)
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    assert(PartitionTransforms.hashLong(1510871468000000L) == -2047944441)
    // string "iceberg" hashes its UTF-8 bytes
    assert(PartitionTransforms.hashString("iceberg") == 1210000089)
    // decimal 14.20 hashes minimal big-endian unscaled bytes (1420)
    assert(PartitionTransforms.hashDecimal(java.math.BigInteger.valueOf(1420)) == -500754589)
  }

  test("murmur3 over LE-8-byte longs equals Spark's own Murmur3_x86_32.hashLong") {
    // independent cross-validation: Spark's hashLong mixes (lo, hi) ints,
    // which is by construction murmur3_x86_32 over the little-endian
    // 8-byte encoding — the exact layout the Iceberg spec fixes. 1000
    // deterministic pseudo-random longs + edge values.
    val edge = Seq(0L, 1L, -1L, 34L, Long.MaxValue, Long.MinValue, 17486L)
    val rnd = edge ++ (0 until 1000).map(i => graft.functions.TextAlgos.splitmix64(i.toLong))
    rnd.foreach { v =>
      assert(PartitionTransforms.hashLong(v) ==
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(v, 0),
        s"divergence at $v")
    }
  }

  test("bucket value is (hash & MaxInt) % n") {
    assert(PartitionTransforms.bucketLong(34L, 16) == (2017239379 & Int.MaxValue) % 16)
    val b = PartitionTransforms.bucketLong(-1L, 8)
    assert(b >= 0 && b < 8, "negative hashes must still land in [0, n)")
  }

  test("truncate uses floored modulus for integers, codepoints for strings") {
    assert(PartitionTransforms.truncateLong(1L, 10L) == 0L)
    assert(PartitionTransforms.truncateLong(-1L, 10L) == -10L) // spec example
    assert(PartitionTransforms.truncateLong(99L, 10L) == 90L)
    assert(PartitionTransforms.truncateString("iceberg", 3) == "ice")
    assert(PartitionTransforms.truncateString("ab", 5) == "ab")
    // surrogate pair counts as ONE codepoint
    assert(PartitionTransforms.truncateString("😀xyz", 2) == "😀x")
  }

  test("temporal ordinals are relative to 1970") {
    val d20171116 = java.time.LocalDate.of(2017, 11, 16).toEpochDay.toInt
    assert(PartitionTransforms.yearOrdinal(d20171116) == 47)
    assert(PartitionTransforms.monthOrdinal(d20171116) == 47 * 12 + 10)
    assert(PartitionTransforms.dayOrdinal(d20171116) == 17486)
    assert(PartitionTransforms.yearOrdinal(0) == 0)
    assert(PartitionTransforms.monthOrdinal(-1) == -1) // 1969-12-31
  }

  test("micros-domain temporal ordinals (timestamp sources)") {
    // 2017-11-16T22:31:08 = day 17486, hour 17486 * 24 + 22 = 419686
    val us = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(PartitionTransforms.hourOrdinal(us) == 419686)
    assert(PartitionTransforms.epochDaysOfMicros(us) == 17486)
    // floored: one micro before midnight 1970 is day -1, hour -1
    assert(PartitionTransforms.epochDaysOfMicros(-1L) == -1)
    assert(PartitionTransforms.hourOrdinal(-1L) == -1)
    assert(PartitionTransforms.hourOrdinal(0L) == 0)
  }

  test("kernels reject non-positive bucket counts / truncate widths") {
    // direct (non-SQL) callers must fail with a clear message, not an
    // ArithmeticException from % 0 or a silently negative bucket
    intercept[IllegalArgumentException](PartitionTransforms.bucketLong(34L, 0))
    intercept[IllegalArgumentException](PartitionTransforms.bucketLong(34L, -8))
    intercept[IllegalArgumentException](PartitionTransforms.bucketString("x", 0))
    intercept[IllegalArgumentException](PartitionTransforms.truncateLong(5L, 0L))
    intercept[IllegalArgumentException](PartitionTransforms.truncateString("x", -1))
  }
}
