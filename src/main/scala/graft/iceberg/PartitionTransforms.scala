package graft.iceberg

import java.nio.charset.StandardCharsets

/** Iceberg partition transforms (hidden partitioning), per the public
  * Iceberg table-spec: `bucket[N]` = `(murmur3_x86_32(bytes) & MaxInt) % N`
  * with type-specific byte layouts (8-byte little-endian for integral /
  * temporal types, UTF-8 for strings, minimal big-endian unscaled for
  * decimals), `truncate[W]` with floored modulus for integers and
  * codepoint prefix for strings, and year/month/day ordinals relative to
  * 1970-01-01.
  *
  * The reference reads the *partition* struct a writer produced
  * (FIXTURES.md fixture is identity-partitioned); these transforms are
  * what a writer needs to PRODUCE spec-correct partition values — the
  * write-side complement, exercised by the i15 entry and pinned against
  * the spec's own published test vectors in PartitionTransformsSpec.
  *
  * All kernels are static pure functions so the codegen'd expressions in
  * [[graft.functions]] can call them from generated Java.
  */
object PartitionTransforms {

  /** murmur3_x86_32, seed 0 — the hash the Iceberg spec fixes for
    * bucketing (public algorithm by Austin Appleby).
    */
  def murmur3(bytes: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = bytes.length
    var h = 0
    var i = 0
    while (i + 4 <= len) {
      var k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    (len & 3) match {
      case 3 =>
        k ^= (bytes(i + 2) & 0xff) << 16
        k ^= (bytes(i + 1) & 0xff) << 8
        k ^= bytes(i) & 0xff
      case 2 =>
        k ^= (bytes(i + 1) & 0xff) << 8
        k ^= bytes(i) & 0xff
      case 1 =>
        k ^= bytes(i) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
    }
    h ^= len
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  private def littleEndian8(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  /** Spec: int, long, date (days), time/timestamp (micros) all hash as the
    * value widened to a long, little-endian — so `bucket(34: Int)` equals
    * `bucket(34L)` and partition values survive int→long type promotion. */
  def hashLong(v: Long): Int = murmur3(littleEndian8(v))

  def hashString(s: String): Int = murmur3(s.getBytes(StandardCharsets.UTF_8))

  /** Spec: decimals hash their minimal two's-complement big-endian
    * unscaled bytes (scale comes from the type, not the value). */
  def hashDecimal(unscaled: java.math.BigInteger): Int = murmur3(unscaled.toByteArray)

  def bucketLong(v: Long, n: Int): Int = {
    require(n > 0, s"bucket count must be positive, got $n")
    (hashLong(v) & Integer.MAX_VALUE) % n
  }

  def bucketString(s: String, n: Int): Int = {
    require(n > 0, s"bucket count must be positive, got $n")
    (hashString(s) & Integer.MAX_VALUE) % n
  }

  /** truncate[W] for integers: `v - (v mod W)` with FLOORED modulus, so
    * negative values truncate toward negative infinity (spec example:
    * truncate(-1, 10) = -10, not 0). */
  def truncateLong(v: Long, w: Long): Long = {
    require(w > 0, s"truncate width must be positive, got $w")
    v - java.lang.Math.floorMod(v, w)
  }

  /** truncate[W] for strings: first W Unicode codepoints (not chars —
    * a surrogate pair counts once). */
  def truncateString(s: String, w: Int): String = {
    require(w > 0, s"truncate width must be positive, got $w")
    val cps = s.codePointCount(0, s.length)
    if (cps <= w) s else s.substring(0, s.offsetByCodePoints(0, w))
  }

  /** Temporal ordinals relative to 1970-01-01 (what Iceberg stores as the
    * partition value for year/month/day transforms). */
  def yearOrdinal(epochDays: Int): Int =
    java.time.LocalDate.ofEpochDay(epochDays.toLong).getYear - 1970

  def monthOrdinal(epochDays: Int): Int = {
    val d = java.time.LocalDate.ofEpochDay(epochDays.toLong)
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }

  def dayOrdinal(epochDays: Int): Int = epochDays

  /** Epoch-micros timestamp → epoch days (floored, so pre-1970 instants
    * land on the correct calendar day) — lets the temporal ordinals
    * serve `year/month/day(ts)` over timestamp columns too. */
  def epochDaysOfMicros(us: Long): Int =
    java.lang.Math.floorDiv(us, 86400000000L).toInt

  /** Hours since 1970-01-01T00:00 (the hour-transform partition value). */
  def hourOrdinal(us: Long): Int =
    java.lang.Math.floorDiv(us, 3600000000L).toInt
}
