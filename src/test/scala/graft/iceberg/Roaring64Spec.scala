package graft.iceberg

import org.scalatest.funsuite.AnyFunSuite

/** The portable 64-bit roaring codec under the container-boundary and
  * bucket-boundary cases that break naive implementations: the 4096
  * array→bitmap threshold, multiple 16-bit containers, positions above
  * 2^32 (multiple high-32 buckets), duplicates, and the run-container
  * READ path (hand-built bytes — the writer never emits runs). */
class Roaring64Spec extends AnyFunSuite {

  private def roundTrip(positions: Array[Long]): Roaring64 = {
    val bytes = Roaring64.fromPositions(positions).serialize
    Roaring64.deserialize(bytes, 0, bytes.length)
  }

  test("empty bitmap") {
    val rt = roundTrip(Array.empty)
    assert(rt.isEmpty && rt.cardinality == 0L && !rt.contains(0L))
  }

  test("array containers: round trip, membership, order") {
    val ps = Array(0L, 1L, 5L, 65535L, 65536L, 131071L, 999999L)
    val rt = roundTrip(ps)
    assert(rt.cardinality == ps.length)
    ps.foreach(p => assert(rt.contains(p), s"missing $p"))
    Seq(2L, 65534L, 131072L, 1000000L).foreach(p => assert(!rt.contains(p)))
    assert(rt.toArray.toSeq == ps.toSeq.sorted)
  }

  test("4096/4097 threshold: array and bitmap container forms agree") {
    // exactly 4096 (stays array) and 4097 (tips to bitmap), one container
    for (n <- Seq(4096, 4097)) {
      val inOne = Array.tabulate(n)(i => i.toLong + 10)
      val rt = roundTrip(inOne)
      assert(rt.cardinality == n.toLong, s"n=$n")
      assert(rt.contains(10L) && rt.contains(n.toLong + 9) && !rt.contains(9L) &&
        !rt.contains(n.toLong + 10))
    }
  }

  test("dense bitmap container plus sparse neighbors") {
    val dense = (0 until 60000).map(_.toLong).toArray // bitmap container 0
    val sparse = Array(70000L, 1234567L)
    val rt = roundTrip(dense ++ sparse)
    assert(rt.cardinality == 60002L)
    assert(rt.contains(0L) && rt.contains(59999L) && !rt.contains(60000L))
    assert(rt.contains(70000L) && rt.contains(1234567L))
  }

  test("positions above 2^32 land in separate buckets") {
    val ps = Array(7L, (1L << 32) + 7L, (1L << 32) + 8L, (5L << 32) + 123L,
      Long.MaxValue - 1)
    val rt = roundTrip(ps)
    assert(rt.cardinality == 5L)
    ps.foreach(p => assert(rt.contains(p), s"missing $p"))
    assert(!rt.contains(8L) && !rt.contains((2L << 32) + 7L) &&
      !rt.contains(Long.MaxValue))
    assert(rt.toArray.toSeq == ps.toSeq.sorted)
  }

  test("duplicates and unsorted input dedupe") {
    val rt = roundTrip(Array(9L, 3L, 9L, 3L, 3L, 1L << 33, 1L << 33))
    assert(rt.cardinality == 3L)
    assert(rt.toArray.toSeq == Seq(3L, 9L, 1L << 33))
  }

  test("negative positions refuse") {
    intercept[IllegalArgumentException](Roaring64.fromPositions(Array(-1L)))
  }

  test("randomized round trip against a reference set") {
    val rnd = new scala.util.Random(20260814)
    val ps = Array.fill(50000)(
      if (rnd.nextInt(10) == 0) (rnd.nextLong() >>> 1) // anywhere in [0, 2^63)
      else rnd.nextInt(1 << 20).toLong)                // clustered low
    val rt = roundTrip(ps)
    val ref = ps.toSet
    assert(rt.cardinality == ref.size.toLong)
    ps.take(5000).foreach(p => assert(rt.contains(p)))
    (0 until 5000).foreach { _ =>
      val probe = rnd.nextInt(1 << 20).toLong
      assert(rt.contains(probe) == ref(probe), s"probe $probe")
    }
  }

  test("run-container read path (foreign writer bytes)") {
    // hand-build one bucket with cookie 12347, one run container holding
    // [10, 14] ∪ [100, 100]; with <4 containers there is no offset header
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(1L)                   // one high-32 bucket
    bb.putInt(0)                     // high key 0
    bb.putInt(12347 | (0 << 16))     // SERIAL_COOKIE, 1 container
    bb.put(1.toByte)                 // run flag bitset: container 0 is run
    bb.putShort(0.toShort)           // container key
    bb.putShort(5.toShort)           // cardinality - 1 = 5 (6 values)
    bb.putShort(2.toShort)           // 2 runs
    bb.putShort(10.toShort); bb.putShort(4.toShort)   // [10, 10+4]
    bb.putShort(100.toShort); bb.putShort(0.toShort)  // [100]
    val bytes = java.util.Arrays.copyOf(bb.array(), bb.position())
    val rt = Roaring64.deserialize(bytes, 0, bytes.length)
    assert(rt.cardinality == 6L)
    (10L to 14L).foreach(p => assert(rt.contains(p)))
    assert(rt.contains(100L) && !rt.contains(9L) && !rt.contains(15L) &&
      !rt.contains(99L) && !rt.contains(101L))
  }
}
