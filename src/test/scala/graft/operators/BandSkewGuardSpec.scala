package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r21 verdict task 2: the LSH band self-join grid-split skew guard
  * ([[Dedup.guardedBandPairs]]). A hot band (boilerplate duplicated across
  * thousands of docs) used to land on ONE hash partition and go quadratic
  * in a single task; the guard spreads it over ⌈n/cap⌉·(⌈n/cap⌉+1)/2
  * blocks. This spec pins (1) PAIR-EXACTNESS — the guarded join emits the
  * same multiset of candidate pairs the unsplit join produced, each
  * co-banded pair exactly once per shared band, (2) the carry-column path
  * d04 uses, (3) BOUNDEDNESS — no grid block holds more than ~2·(band
  * rows/g) rows, so per-task work is capped, and (4) the hot-band fixture
  * end-to-end: 1k copies of one document through the full minhashDedup
  * entry, completing with the exact C(1000,2) pair count. */
class BandSkewGuardSpec extends SparkSpec {

  test("guarded pairs == unsplit pairs, each exactly once per shared band") {
    import spark.implicits._
    // one hot band (200 docs), two normal bands, one doc in two bands
    val rows =
      (1L to 200L).map(id => (id, 0, 42L)) ++
        Seq((300L, 1, 7L), (301L, 1, 7L), (302L, 1, 7L)) ++
        Seq((300L, 2, 9L), (301L, 2, 9L))
    val bands = rows.toDF("doc_id", "band_idx", "band_key")
    val got = Dedup.guardedBandPairs(bands, cap = 16)
      .groupBy($"doc_a", $"doc_b").count().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // brute-force reference: per-band pair multiset
    val expected = rows.groupBy(r => (r._2, r._3)).values.flatMap { g =>
      for (a <- g; b <- g if a._1 < b._1) yield (a._1, b._1)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expected,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet} " +
        s"countDiff=${got.filter { case (k, v) => expected.get(k).exists(_ != v) }}")
    // (300,301) shares two bands — exactly once per band, so count 2
    assert(got((300L, 301L)) == 2L)
  }

  test("carry columns ride through as <c>_a / <c>_b (the d04 shape)") {
    import spark.implicits._
    val bands = Seq((1L, 0, 5L, 111L), (2L, 0, 5L, 222L), (3L, 1, 5L, 333L))
      .toDF("doc_id", "band_idx", "band_key", "sh")
    val out = Dedup.guardedBandPairs(bands, carry = Seq("sh")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      == Seq((1L, 2L, 111L, 222L)))
  }

  test("no grid block exceeds the per-task bound on a hot band") {
    import spark.implicits._
    val n = 1000
    val cap = 32
    val g = math.ceil(n.toDouble / cap).toInt
    // replay the guard's deterministic placement: salt + per-(block) sizes
    val salts = spark.range(1, n + 1)
      .select(pmod(xxhash64($"id"), lit(g.toLong)).cast("int").as("s"))
      .groupBy($"s").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxSalt = salts.values.max
    val maxBlock = (for (i <- 0 until g; j <- i until g) yield
      if (i == j) salts.getOrElse(i, 0L)
      else salts.getOrElse(i, 0L) + salts.getOrElse(j, 0L)).max
    // per-block rows track 2·n/g (hash balance), never the whole band
    assert(maxBlock <= 4L * cap,
      s"block of $maxBlock rows for n=$n cap=$cap (maxSalt=$maxSalt)")
    assert(maxBlock < n / 4, "the hot band must actually spread")
  }

  test("hot-band fixture end-to-end: 1k copies through minhashDedup") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-hotband").toString
    val doc = "the quick brown fox jumps over the lazy dog again and again " +
      "until the corpus is thoroughly boilerplated with repeated text"
    val copies = (1L to 1000L).map(id => (id, "src", doc))
    (copies :+ ((2000L, "src", "a completely unrelated document about " +
      "spark shuffles partitions and adaptive execution plans")))
      .toDF("doc_id", "source", "text")
      .coalesce(2).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Dedup.minhashDedup(spark, d)
    // exact candidate recall on identical docs: all C(1000,2) pairs at
    // jaccard 1.0, the unrelated doc in none
    assert(out.count() == 1000L * 999L / 2)
    val sample = out.filter($"doc_a" === 1L && $"doc_b" === 2L).collect()
    assert(sample.length == 1 && sample.head.getDouble(2) == 1.0)
  }
}
