package graft.iceberg

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ZOrderAlgo

/** Z-order clustering: the Morton-key kernel's order-preserving
  * normalization, and `rewrite_data_files(strategy => 'sort')` in both
  * its linear and zorder() forms — correctness (content identical after
  * the rewrite) plus the PRUNING claim that justifies the curve: after
  * zorder(x, y), a selective predicate on EITHER column alone prunes
  * most files by bound stats; after a linear sort on x, a y-only
  * predicate prunes nothing. */
class ZOrderSpec extends SparkSpec {

  test("normalization preserves order per type; interleave is the z-curve") {
    // the normalized images compare UNSIGNED (that is what byte-wise
    // lexicographic comparison of the interleaved key does)
    def isUnsignedSorted(xs: Seq[Long]): Boolean =
      xs.zip(xs.tail).forall { case (a, b) => java.lang.Long.compareUnsigned(a, b) < 0 }
    // longs incl. negatives
    val ls = Seq(Long.MinValue, -5L, -1L, 0L, 1L, 42L, Long.MaxValue)
    assert(isUnsignedSorted(ls.map(ZOrderAlgo.normLong)))
    // doubles incl. negatives and infinities (NaN sorts above all)
    val ds = Seq(Double.NegativeInfinity, -1e30, -2.5, -0.0, 0.0, 1e-3,
      3.14, Double.PositiveInfinity, Double.NaN)
    assert(isUnsignedSorted(ds.map(ZOrderAlgo.normDouble).distinct),
      ds.map(ZOrderAlgo.normDouble).toString)
    // strings by prefix bytes
    assert(isUnsignedSorted(Seq("", "a", "ab", "b", "zz").map(s =>
      ZOrderAlgo.normBytes(s.getBytes("UTF-8")))))
    // 2-d interleave: (0,0) < (0,1) and (1,0) interleave to the known
    // Morton pattern — x's bits land at even positions, y's at odd
    val k10 = ZOrderAlgo.interleave(Array(1L, 0L))
    val k01 = ZOrderAlgo.interleave(Array(0L, 1L))
    // lowest bit of x -> bit 126 of the 128-bit key (byte 15, bit 0x02);
    // lowest bit of y -> bit 127 (byte 15, bit 0x01)
    assert((k10(15) & 0xff) == 0x02 && (k01(15) & 0xff) == 0x01)
  }

  test("zorder rewrite: content identical, multi-column pruning unlocked") {
    val wh = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    spark.conf.set("spark.sql.catalog.gz",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gz.warehouse", wh)
    spark.sql("CREATE TABLE gz.db.t (x BIGINT, y BIGINT, payload STRING) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    // a 200×200 grid makes x and y TRULY independent (a multiplicative
    // scramble of the same id would leave y a function of x and hand a
    // linear sort accidental y clustering); incompressible payload so
    // the rewrite really fans out to many files
    spark.sql("""INSERT INTO gz.db.t
      SELECT id % 200 AS x, CAST(id / 200 AS BIGINT) % 200 AS y,
             md5(cast(id AS string)) AS payload
      FROM range(0, 40000)""")
    val expected = spark.sql("SELECT sum(x), sum(y), count(*) FROM gz.db.t").head()

    // small target so the rewrite fans out to MANY files
    val row = spark.sql("CALL gz.system.rewrite_data_files(table => 'db.t', " +
      "target_file_size_bytes => 32768, strategy => 'sort', " +
      "sort_order => 'zorder(x, y)')").head()
    assert(row.getInt(1) >= 8, s"expected a multi-file rewrite, got $row")
    assert(spark.sql("SELECT sum(x), sum(y), count(*) FROM gz.db.t").head() ==
      expected, "zorder rewrite must not change content")

    val all = spark.sql("SELECT payload FROM gz.db.t")
    val nAll = all.rdd.getNumPartitions
    val xOnly = spark.sql("SELECT payload FROM gz.db.t WHERE x < 20")
    val yOnly = spark.sql("SELECT payload FROM gz.db.t WHERE y < 20")
    assert(xOnly.rdd.getNumPartitions * 2 <= nAll,
      s"x-pruning after zorder: ${xOnly.rdd.getNumPartitions} of $nAll")
    assert(yOnly.rdd.getNumPartitions * 2 <= nAll,
      s"y-pruning after zorder: ${yOnly.rdd.getNumPartitions} of $nAll")
    assert(xOnly.count() == spark.sql(
      "SELECT count(*) FROM gz.db.t WHERE x < 20").head().getLong(0))

    // contrast: a LINEAR sort on x gives y-only predicates nothing
    spark.sql("CALL gz.system.rewrite_data_files(table => 'db.t', " +
      "target_file_size_bytes => 32768, strategy => 'sort', " +
      "sort_order => 'x')")
    assert(spark.sql("SELECT sum(x), sum(y), count(*) FROM gz.db.t").head() ==
      expected)
    val nAll2 = spark.sql("SELECT payload FROM gz.db.t").rdd.getNumPartitions
    val xLinear = spark.sql("SELECT payload FROM gz.db.t WHERE x < 20")
    val yLinear = spark.sql("SELECT payload FROM gz.db.t WHERE y < 20")
    assert(xLinear.rdd.getNumPartitions * 2 <= nAll2,
      "x prunes under the linear sort")
    assert(yLinear.rdd.getNumPartitions == nAll2,
      s"y cannot prune under a linear x sort: ${yLinear.rdd.getNumPartitions} of $nAll2")
  }

  test("sorted rewrite preserves content across 20 consecutive rewrites") {
    // determinism soak for the one historical flake (r13 i86): every
    // rewrite moves every row of the table, so ANY nondeterminism window
    // (range-exchange bounds, task-writer collision) shows up as a
    // count/sum drift across repetitions. 20 full rewrites, content
    // fingerprint asserted after each.
    val wh = java.nio.file.Files.createTempDirectory("graft-zsoak").toString
    spark.conf.set("spark.sql.catalog.gzk",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzk.warehouse", wh)
    spark.sql("CREATE TABLE gzk.db.t (x BIGINT, y BIGINT, s STRING) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("""INSERT INTO gzk.db.t
      SELECT id % 97, id % 89, md5(cast(id AS string)) FROM range(0, 8000)""")
    val expected = spark.sql(
      "SELECT count(*), sum(x), sum(y), sum(crc32(s)) FROM gzk.db.t").head()
    (1 to 20).foreach { i =>
      val order = if (i % 2 == 0) "zorder(x, y)" else "x DESC, y"
      spark.sql("CALL gzk.system.rewrite_data_files(table => 'db.t', " +
        s"target_file_size_bytes => 65536, strategy => 'sort', " +
        s"sort_order => '$order')")
      val got = spark.sql(
        "SELECT count(*), sum(x), sum(y), sum(crc32(s)) FROM gzk.db.t").head()
      assert(got == expected, s"content drifted at rewrite #$i: $got != $expected")
    }
  }

  test("sort rewrite parses DESC and rejects bad strategy/order") {
    val wh = java.nio.file.Files.createTempDirectory("graft-zsort").toString
    spark.conf.set("spark.sql.catalog.gzs",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzs.warehouse", wh)
    spark.sql("CREATE TABLE gzs.db.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO gzs.db.t SELECT id, concat('v', id) FROM range(0, 1000)")
    spark.sql("CALL gzs.system.rewrite_data_files(table => 'db.t', " +
      "strategy => 'sort', sort_order => 'k DESC')")
    assert(spark.sql("SELECT count(*), sum(k) FROM gzs.db.t").head() ==
      org.apache.spark.sql.Row(1000L, 499500L))
    intercept[Exception](spark.sql(
      "CALL gzs.system.rewrite_data_files(table => 'db.t', strategy => 'shuffle')"))
    intercept[Exception](spark.sql(
      "CALL gzs.system.rewrite_data_files(table => 'db.t', strategy => 'sort')"))
    intercept[Exception](spark.sql(
      "CALL gzs.system.rewrite_data_files(table => 'db.t', strategy => 'sort', " +
        "sort_order => 'zorder(nope)')"))
  }
}
