package graft.iceberg

import java.nio.{ByteBuffer, ByteOrder}

/** Portable 64-bit Roaring bitmap — the serialization Iceberg v3
  * deletion vectors mandate (spec: Delete Formats → Deletion Vectors,
  * "64-bit implementation of Roaring Bitmap" in the RoaringFormatSpec's
  * portable layout). Written from scratch against the PUBLIC format
  * description so the engine carries no bitmap dependency:
  *
  *   - 64-bit portable: `u64 LE` bucket count, then per bucket (in
  *     unsigned key order) a `u32 LE` high-32 key followed by a standard
  *     32-bit roaring serialization of the bucket's low-32 members.
  *   - 32-bit standard: cookie `12346` (`u32 LE`) + `u32 LE` container
  *     count when no run containers are present (what this writer
  *     emits), or cookie `12347 | (count-1) << 16` + a run-flag bitset
  *     (accepted on read); a descriptive header of (`u16 LE` key,
  *     `u16 LE` cardinality-1) per container; an offset header (always
  *     with cookie 12346; with 12347 only when count >= 4); then the
  *     containers in key order — array (sorted `u16 LE` values,
  *     cardinality <= 4096), bitmap (1024 `u64 LE` words), or run
  *     (`u16 LE` run count, then (`u16 LE` start, `u16 LE` length-1)
  *     pairs; read-only here).
  *
  * The in-memory shape is immutable and query-optimized: per-bucket
  * container directories probed by binary search, with a one-element
  * cache on the (bucket, container) of the last hit — a deletion
  * vector's positions cluster heavily, so the common MOR probe path is
  * two array reads and no search. Positions are non-negative longs
  * (Iceberg row coordinates). */
final class Roaring64 private[iceberg] (
    private val highKeys: Array[Int],          // unsigned-ordered high-32 keys
    private val buckets: Array[Roaring64.Bucket]) {

  import Roaring64.Bucket

  def isEmpty: Boolean = highKeys.length == 0

  def cardinality: Long = {
    var c = 0L
    var i = 0
    while (i < buckets.length) { c += buckets(i).cardinality; i += 1 }
    c
  }

  // last-hit cache: DV probes arrive in near-sorted row order
  private var lastBucket = -1
  private var lastContainer: Bucket = null

  def contains(pos: Long): Boolean = {
    val high = (pos >>> 32).toInt
    val b =
      if (lastBucket >= 0 && highKeys(lastBucket) == high) lastContainer
      else {
        val i = Roaring64.unsignedSearch(highKeys, high)
        if (i < 0) return false
        lastBucket = i
        lastContainer = buckets(i)
        lastContainer
      }
    b.contains((pos & 0xffffffffL).toInt)
  }

  /** Ascending iteration over every set position — the inspection-table
    * and merge path (never the per-row probe path). */
  def foreachPosition(f: Long => Unit): Unit = {
    var i = 0
    while (i < highKeys.length) {
      val highBits = (highKeys(i).toLong & 0xffffffffL) << 32
      buckets(i).foreachLow(low => f(highBits | (low.toLong & 0xffffffffL)))
      i += 1
    }
  }

  def toArray: Array[Long] = {
    val n = cardinality
    require(n <= Int.MaxValue, s"bitmap too large to materialize: $n")
    val out = new Array[Long](n.toInt)
    var k = 0
    foreachPosition { p => out(k) = p; k += 1 }
    out
  }

  /** Portable serialization (see class doc). Emits array/bitmap
    * containers only — always a valid portable stream. */
  def serialize: Array[Byte] = {
    var size = 8
    var i = 0
    while (i < buckets.length) { size += 4 + buckets(i).serializedSize; i += 1 }
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(highKeys.length.toLong)
    i = 0
    while (i < buckets.length) {
      buf.putInt(highKeys(i))
      buckets(i).serializeInto(buf)
      i += 1
    }
    buf.array()
  }
}

object Roaring64 {

  /** One 32-bit roaring bitmap: parallel arrays of `u16` container keys
    * (stored as positive ints) and containers. A container is either a
    * sorted `Array[Short]` of values (array form) or an `Array[Long]` of
    * 1024 words (bitmap form) — run containers normalize to one of these
    * at read time. */
  private[iceberg] final class Bucket(
      val keys: Array[Int],
      val containers: Array[AnyRef]) {

    def cardinality: Long = {
      var c = 0L
      var i = 0
      while (i < containers.length) {
        containers(i) match {
          case a: Array[Short] => c += a.length
          case w: Array[Long] =>
            var j = 0
            while (j < 1024) { c += java.lang.Long.bitCount(w(j)); j += 1 }
        }
        i += 1
      }
      c
    }

    private var lastKeyIdx = -1

    def contains(low: Int): Boolean = {
      val key = low >>> 16
      val idx =
        if (lastKeyIdx >= 0 && keys(lastKeyIdx) == key) lastKeyIdx
        else {
          val i = java.util.Arrays.binarySearch(keys, key)
          if (i < 0) return false
          lastKeyIdx = i
          i
        }
      val v = (low & 0xffff).toShort
      containers(idx) match {
        case a: Array[Short] => shortSearch(a, v) >= 0
        case w: Array[Long] =>
          val u = low & 0xffff
          (w(u >>> 6) & (1L << (u & 63))) != 0
      }
    }

    def foreachLow(f: Int => Unit): Unit = {
      var i = 0
      while (i < keys.length) {
        val base = keys(i) << 16
        containers(i) match {
          case a: Array[Short] =>
            var j = 0
            while (j < a.length) { f(base | (a(j) & 0xffff)); j += 1 }
          case w: Array[Long] =>
            var word = 0
            while (word < 1024) {
              var bits = w(word)
              while (bits != 0) {
                f(base | (word << 6) | java.lang.Long.numberOfTrailingZeros(bits))
                bits &= bits - 1
              }
              word += 1
            }
        }
        i += 1
      }
    }

    private def containerCardinality(c: AnyRef): Int = c match {
      case a: Array[Short] => a.length
      case w: Array[Long] =>
        var j = 0; var n = 0
        while (j < 1024) { n += java.lang.Long.bitCount(w(j)); j += 1 }
        n
    }

    /** Size of the standard 32-bit serialization this writer emits
      * (cookie 12346: no run containers). */
    def serializedSize: Int = {
      var s = 4 + 4 + 4 * containers.length + 4 * containers.length
      var i = 0
      while (i < containers.length) {
        s += (containers(i) match {
          case a: Array[Short] => 2 * a.length
          case _: Array[Long] => 8192
        })
        i += 1
      }
      s
    }

    def serializeInto(buf: ByteBuffer): Unit = {
      val start = buf.position()
      buf.putInt(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
      buf.putInt(containers.length)
      var i = 0
      while (i < containers.length) {
        buf.putShort(keys(i).toShort)
        buf.putShort((containerCardinality(containers(i)) - 1).toShort)
        i += 1
      }
      // offset header: container byte offsets from the bucket's cookie
      var off = 8 + 8 * containers.length
      i = 0
      while (i < containers.length) {
        buf.putInt(off)
        off += (containers(i) match {
          case a: Array[Short] => 2 * a.length
          case _: Array[Long] => 8192
        })
        i += 1
      }
      i = 0
      while (i < containers.length) {
        containers(i) match {
          case a: Array[Short] =>
            var j = 0
            while (j < a.length) { buf.putShort(a(j)); j += 1 }
          case w: Array[Long] =>
            var j = 0
            while (j < 1024) { buf.putLong(w(j)); j += 1 }
        }
        i += 1
      }
      // the offset header must describe what we actually wrote
      assert(buf.position() - start == off, "roaring container offset drift")
    }
  }

  private def shortSearch(a: Array[Short], v: Short): Int = {
    // unsigned-u16 binary search (Arrays.binarySearch is signed)
    var lo = 0
    var hi = a.length - 1
    val uv = v & 0xffff
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val um = a(mid) & 0xffff
      if (um < uv) lo = mid + 1
      else if (um > uv) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  private[iceberg] def unsignedSearch(a: Array[Int], key: Int): Int = {
    var lo = 0
    var hi = a.length - 1
    val uk = key.toLong & 0xffffffffL
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val um = a(mid).toLong & 0xffffffffL
      if (um < uk) lo = mid + 1
      else if (um > uk) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  /** Build from positions. Input need not be sorted or distinct — the
    * builder sorts and dedupes (delete positions arrive sorted from the
    * writer path, making this a near-no-op verify pass). */
  def fromPositions(positions: Array[Long]): Roaring64 = {
    if (positions.isEmpty) return new Roaring64(Array.empty, Array.empty)
    val sorted = positions.clone()
    java.util.Arrays.sort(sorted)
    require(sorted(0) >= 0, s"negative position ${sorted(0)}")

    val highKeys = scala.collection.mutable.ArrayBuffer.empty[Int]
    val buckets = scala.collection.mutable.ArrayBuffer.empty[Bucket]

    var i = 0
    while (i < sorted.length) {
      val high = (sorted(i) >>> 32).toInt
      var end = i
      while (end < sorted.length && (sorted(end) >>> 32).toInt == high) end += 1
      buckets += buildBucket(sorted, i, end)
      highKeys += high
      i = end
    }
    new Roaring64(highKeys.toArray, buckets.toArray)
  }

  private def buildBucket(sorted: Array[Long], from: Int, to: Int): Bucket = {
    val keys = scala.collection.mutable.ArrayBuffer.empty[Int]
    val containers = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = from
    while (i < to) {
      val low0 = (sorted(i) & 0xffffffffL).toInt
      val key = low0 >>> 16
      var end = i
      // distinct count within the container (input may carry duplicates)
      var distinct = 0
      var prev = -1L
      while (end < to && ((sorted(end) & 0xffffffffL).toInt >>> 16) == key) {
        if (sorted(end) != prev) { distinct += 1; prev = sorted(end) }
        end += 1
      }
      if (distinct <= 4096) {
        val arr = new Array[Short](distinct)
        var k = 0
        prev = -1L
        var j = i
        while (j < end) {
          if (sorted(j) != prev) {
            arr(k) = (sorted(j) & 0xffff).toShort; k += 1; prev = sorted(j)
          }
          j += 1
        }
        containers += arr
      } else {
        val words = new Array[Long](1024)
        var j = i
        while (j < end) {
          val u = (sorted(j) & 0xffff).toInt
          words(u >>> 6) |= 1L << (u & 63)
          j += 1
        }
        containers += words
      }
      keys += key
      i = end
    }
    new Bucket(keys.toArray, containers.toArray)
  }

  /** Deserialize a portable stream (reads all three container forms —
    * run containers normalize to array/bitmap). */
  def deserialize(bytes: Array[Byte], offset: Int, length: Int): Roaring64 = {
    val buf = ByteBuffer.wrap(bytes, offset, length).order(ByteOrder.LITTLE_ENDIAN)
    val nBuckets = buf.getLong
    require(nBuckets >= 0 && nBuckets <= Int.MaxValue, s"bucket count $nBuckets")
    val highKeys = new Array[Int](nBuckets.toInt)
    val buckets = new Array[Bucket](nBuckets.toInt)
    var b = 0
    while (b < nBuckets) {
      highKeys(b) = buf.getInt
      buckets(b) = readBucket(buf)
      b += 1
    }
    new Roaring64(highKeys, buckets)
  }

  private def readBucket(buf: ByteBuffer): Bucket = {
    val bucketStart = buf.position()
    val cookie = buf.getInt
    val hasRuns = (cookie & 0xffff) == 12347
    require(hasRuns || cookie == 12346, s"bad roaring cookie $cookie")
    val n = if (hasRuns) (cookie >>> 16) + 1 else buf.getInt
    val runFlags: Array[Byte] =
      if (hasRuns) { val f = new Array[Byte]((n + 7) / 8); buf.get(f); f }
      else null
    def isRun(i: Int): Boolean =
      hasRuns && (runFlags(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = buf.getShort & 0xffff
      cards(i) = (buf.getShort & 0xffff) + 1
      i += 1
    }
    val hasOffsets = !hasRuns || n >= 4
    val offsets = if (hasOffsets) { val o = new Array[Int](n); var j = 0
      while (j < n) { o(j) = buf.getInt; j += 1 }; o } else null
    val containers = new Array[AnyRef](n)
    i = 0
    while (i < n) {
      if (hasOffsets) buf.position(bucketStart + offsets(i))
      containers(i) =
        if (isRun(i)) {
          val nRuns = buf.getShort & 0xffff
          val values = scala.collection.mutable.ArrayBuffer.empty[Int]
          var r = 0
          while (r < nRuns) {
            val start = buf.getShort & 0xffff
            val len = (buf.getShort & 0xffff) + 1
            var v = start
            while (v < start + len) { values += v; v += 1 }
            r += 1
          }
          if (values.length <= 4096) values.map(_.toShort).toArray
          else {
            val words = new Array[Long](1024)
            values.foreach(u => words(u >>> 6) |= 1L << (u & 63))
            words
          }
        } else if (cards(i) <= 4096) {
          val arr = new Array[Short](cards(i))
          var j = 0
          while (j < cards(i)) { arr(j) = buf.getShort; j += 1 }
          arr
        } else {
          val words = new Array[Long](1024)
          var j = 0
          while (j < 1024) { words(j) = buf.getLong; j += 1 }
          words
        }
      i += 1
    }
    new Bucket(keys, containers)
  }
}
