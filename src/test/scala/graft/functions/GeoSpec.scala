package graft.functions

import org.apache.spark.sql.Row

import graft.SparkSpec

/** WKB point kernels: golden bytes for both byte orders, refusals, and
  * the SQL surface under whole-stage codegen. */
class GeoSpec extends SparkSpec {

  test("pointWkb lays out canonical little-endian WKB") {
    val b = GeoAlgos.pointWkb(1.0, -2.5)
    assert(b.length == 21)
    assert(b(0) == 1 && b(1) == 1 && b(2) == 0 && b(3) == 0 && b(4) == 0)
    assert(GeoAlgos.pointCoord(b, 0) == 1.0 && GeoAlgos.pointCoord(b, 1) == -2.5)
  }

  test("pointCoord reads a hand-laid BIG-endian foreign point") {
    // 00 (BE) | 00000001 (point) | x = 2.0 | y = 0.5
    val bb = java.nio.ByteBuffer.allocate(21)
    bb.put(0.toByte).putInt(1).putDouble(2.0).putDouble(0.5)
    val b = bb.array()
    assert(GeoAlgos.pointCoord(b, 0) == 2.0 && GeoAlgos.pointCoord(b, 1) == 0.5)
  }

  test("non-point geometry types and malformed buffers refuse") {
    val line = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(2).putDouble(0).putDouble(0).array() // LineString
    intercept[IllegalArgumentException](GeoAlgos.pointCoord(line, 0))
    intercept[IllegalArgumentException](GeoAlgos.pointCoord(Array[Byte](1, 1), 0))
    intercept[IllegalArgumentException](
      GeoAlgos.pointCoord(GeoAlgos.pointWkb(0, 0).updated(0, 7.toByte), 0))
  }

  test("SQL surface round-trips through codegen; nulls propagate") {
    GraftFunctions.register(spark)
    val rows = spark.sql("""SELECT graft_st_x(p) AS x, graft_st_y(p) AS y
      FROM (SELECT graft_st_point(CAST(id AS DOUBLE) - 0.5,
                                  CAST(id AS DOUBLE) * 0.25) AS p
            FROM range(0, 100))
      ORDER BY x""").collect()
    assert(rows.length == 100)
    assert(rows.head == Row(-0.5, 0.0) && rows.last == Row(98.5, 24.75))
    assert(spark.sql(
      "SELECT graft_st_x(CAST(NULL AS BINARY)), " +
        "graft_st_point(CAST(NULL AS DOUBLE), CAST(1.0 AS DOUBLE))")
      .head() == Row(null, null))
  }
}
