package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (r21): warm A/B of d09 variants — old pairs pipeline
  * (broadcast band join, kernel per side) + identity-seed loop vs the
  * committed r21 form (single-exchange bands + fused first round). */
object R21Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("r21probe3", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._
    import graft.functions.GraftFunctions

    def pairsOld(): DataFrame = {
      val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
      val withShingles = docs
        .withColumn("shingles", GraftFunctions.shingleHashes(spark, $"text", 3))
        .select($"doc_id", $"shingles")
      val bands = docs
        .select($"doc_id", posexplode(GraftFunctions.minhashBands(spark, $"text", 3, 64, 16)))
        .toDF("doc_id", "band_idx", "band_key")
      val candidates = bands.as("a")
        .join(bands.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
      candidates
        .join(withShingles.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(withShingles.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .withColumn("n_inter", size(array_intersect($"sh_a", $"sh_b")))
        .withColumn("jaccard",
          $"n_inter".cast("double") / (size($"sh_a") + size($"sh_b") - $"n_inter"))
        .filter($"jaccard" >= 0.8)
        .select($"doc_a", $"doc_b")
    }

    def d09From(pairs: DataFrame, fusedSeed: Boolean): DataFrame = {
      val edges = pairs.union(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
        .toDF("src", "dst").cache()
      var labels =
        if (fusedSeed)
          edges.groupBy($"src").agg(min($"dst").as("n0"))
            .select($"src".as("doc_id"), least($"src", $"n0").as("lbl"))
        else
          edges.select($"src".as("doc_id")).distinct().withColumn("lbl", $"doc_id")
      val shufKey = "spark.sql.shuffle.partitions"
      val prevShuf = spark.conf.get(shufKey)
      spark.conf.set(shufKey, "4")
      var prevSum = Long.MaxValue
      var converged = false
      var rounds = 0
      try while (!converged && rounds < 20) {
        val viaNeighbor = edges
          .join(labels.withColumnRenamed("doc_id", "dst").withColumnRenamed("lbl", "n_lbl"), "dst")
          .groupBy($"src".as("doc_id")).agg(min($"n_lbl").as("n_lbl"))
        val next = labels.join(viaNeighbor, Seq("doc_id"), "left_outer")
          .select($"doc_id", least($"lbl", coalesce($"n_lbl", $"lbl")).as("lbl"))
          .cache()
        val sumRow = next.agg(sum($"lbl")).head()
        val s = if (sumRow.isNullAt(0)) 0L else sumRow.getLong(0)
        if (rounds > 0) labels.unpersist()
        labels = next
        converged = s == prevSum
        prevSum = s
        rounds += 1
      } finally spark.conf.set(shufKey, prevShuf)
      edges.unpersist()
      val projected = labels.select($"doc_id", $"lbl".as("cluster_rep")).orderBy($"doc_id")
      val out = projected.localCheckpoint()
      labels.unpersist()
      println(s"  (rounds=$rounds)")
      out
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "d09 old (bcast pairs, identity seed)" ->
        (() => d09From(pairsOld(), fusedSeed = false)),
      "d09 new (committed entry)" ->
        (() => SparkEntry.queries("d09_neardup_clusters")(spark, dir)))
    SparkEntry.entry(spark).count()
    (1 to 3).foreach { round =>
      variants.foreach { case (name, q) =>
        val t0 = System.nanoTime()
        val n = q().count()
        println(f"PERF $name round$round ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
