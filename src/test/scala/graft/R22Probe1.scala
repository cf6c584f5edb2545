package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (r22): where does the band-split guard's local cost go?
  * Variants of the d03 candidate join, warm, same session:
  *   v0 = r21 unsplit single-exchange self-join
  *   v1 = r22 guarded (window count + block exchange)
  *   v2 = window count only, join still on (band,key) — isolates the Sort+Window
  *   v3 = block exchange with fixed g=1 (no window) — isolates the 2nd exchange
  * Run: sbt "Test/runMain graft.R22Probe1 [dir] [rounds]"
  */
object R22Probe1 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.local("r22probe1", "32")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    def bands: DataFrame = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
      .select($"doc_id",
        posexplode(graft.functions.GraftFunctions.minhashBands(spark, $"text", 3, 64, 16)))
      .toDF("doc_id", "band_idx", "band_key")

    def v0: DataFrame = {
      val b = bands.repartition($"band_idx", $"band_key")
      b.as("a").join(b.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    }
    def v1: DataFrame = graft.operators.Dedup.guardedBandPairs(bands).distinct()
    def v2: DataFrame = {
      val wB = Window.partitionBy($"band_idx", $"band_key")
      val b = bands.repartition($"band_idx", $"band_key")
        .withColumn("_g", ceil(count(lit(1)).over(wB) / lit(256.0)).cast("int"))
      b.as("a").join(b.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    }
    def v3: DataFrame = {
      val b = bands.repartition($"band_idx", $"band_key")
        .withColumn("_s", lit(0)).withColumn("_blo", lit(0)).withColumn("_bhi", lit(0))
        .repartition($"band_idx", $"band_key", $"_blo", $"_bhi")
      b.as("a").join(b.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
            $"a._blo" === $"b._blo" && $"a._bhi" === $"b._bhi" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    }
    // v4: window + salt + block exchange, NO explode (t = salt constant)
    def v4: DataFrame = {
      val wB = Window.partitionBy($"band_idx", $"band_key")
      val b = bands.repartition($"band_idx", $"band_key")
        .withColumn("_g", ceil(count(lit(1)).over(wB) / lit(256.0)).cast("int"))
        .withColumn("_s", pmod(xxhash64($"doc_id"), $"_g".cast("long")).cast("int"))
        .withColumn("_blo", $"_s").withColumn("_bhi", $"_s")
        .repartition($"band_idx", $"band_key", $"_blo", $"_bhi")
      b.as("a").join(b.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
            $"a._blo" === $"b._blo" && $"a._bhi" === $"b._bhi" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    }
    // v5: v1 shape but explode of a literal 1-element sequence
    def v5: DataFrame = {
      val wB = Window.partitionBy($"band_idx", $"band_key")
      val b = bands.repartition($"band_idx", $"band_key")
        .withColumn("_g", ceil(count(lit(1)).over(wB) / lit(256.0)).cast("int"))
        .withColumn("_s", pmod(xxhash64($"doc_id"), $"_g".cast("long")).cast("int"))
        .withColumn("_t", explode(sequence(lit(0), lit(0))))
        .withColumn("_blo", least($"_s", $"_t")).withColumn("_bhi", greatest($"_s", $"_t"))
        .repartition($"band_idx", $"band_key", $"_blo", $"_bhi")
      b.as("a").join(b.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
            $"a._blo" === $"b._blo" && $"a._bhi" === $"b._bhi" &&
            ($"a._s" =!= $"b._s" || $"a._blo" === $"a._bhi") &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    }
    // v6: hybrid — cold bands (g=1) join on the existing (band,key)
    // partitioning with NO extra exchange; only hot-band rows take the
    // grid-split exchange (guide §2.5: special-case the hot keys)
    def v6: DataFrame = {
      val wB = Window.partitionBy($"band_idx", $"band_key")
      val counted = bands.repartition($"band_idx", $"band_key")
        .withColumn("_g", ceil(count(lit(1)).over(wB) / lit(256.0)).cast("int"))
      val cold = counted.filter($"_g" === 1)
      val coldPairs = cold.as("a").join(cold.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      val hot = counted.filter($"_g" > 1)
        .withColumn("_s", pmod(xxhash64($"doc_id"), $"_g".cast("long")).cast("int"))
        .withColumn("_t", explode(sequence(lit(0), $"_g" - 1)))
        .select($"doc_id", $"band_idx", $"band_key", $"_s",
          least($"_s", $"_t").as("_blo"), greatest($"_s", $"_t").as("_bhi"))
        .repartition($"band_idx", $"band_key", $"_blo", $"_bhi")
      val hotPairs = hot.as("a").join(hot.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
            $"a._blo" === $"b._blo" && $"a._bhi" === $"b._bhi" &&
            ($"a._s" =!= $"b._s" || $"a._blo" === $"a._bhi") &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      coldPairs.unionByName(hotPairs).distinct()
    }
    // v7: hot-band summary via HashAggregate over the reused exchange
    // (no sort/window on the main stream), broadcast-tagged; cold rows
    // keep the r21 join shape exactly, hot rows grid-split
    def v7: DataFrame = {
      val b0 = bands.repartition($"band_idx", $"band_key")
      val hotBands = b0.groupBy($"band_idx", $"band_key")
        .agg(count(lit(1)).as("_n")).filter($"_n" > 256)
        .select($"band_idx", $"band_key", ceil($"_n" / lit(256.0)).cast("int").as("_g"))
      val tagged = b0.join(broadcast(hotBands), Seq("band_idx", "band_key"), "left_outer")
      val cold = tagged.filter($"_g".isNull)
      val coldPairs = cold.as("a").join(cold.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      val hot = tagged.filter($"_g".isNotNull)
        .withColumn("_s", pmod(xxhash64($"doc_id"), $"_g".cast("long")).cast("int"))
        .withColumn("_t", explode(sequence(lit(0), $"_g" - 1)))
        .select($"doc_id", $"band_idx", $"band_key", $"_s",
          least($"_s", $"_t").as("_blo"), greatest($"_s", $"_t").as("_bhi"))
        .repartition($"band_idx", $"band_key", $"_blo", $"_bhi")
      val hotPairs = hot.as("a").join(hot.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
            $"a._blo" === $"b._blo" && $"a._bhi" === $"b._bhi" &&
            ($"a._s" =!= $"b._s" || $"a._blo" === $"a._bhi") &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      coldPairs.unionByName(hotPairs).distinct()
    }
    val variants = Seq("v0" -> (() => v0), "v1" -> (() => v1),
      "v2" -> (() => v2), "v3" -> (() => v3), "v4" -> (() => v4),
      "v5" -> (() => v5), "v6" -> (() => v6), "v7" -> (() => v7))
    variants.foreach { case (_, f) => f().count() } // warm all
    for (r <- 1 to rounds; (n, f) <- variants) {
      val t0 = System.nanoTime()
      val c = f().count()
      println(f"PROBE1 round=$r $n rows=$c%6d ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    spark.stop()
  }
}
