package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (r21, session 2): warm interleaved A/B for the d09
  * connected-components loop — old formulation (uncached seed, first
  * convergence check after round 1, baseline MaxValue ⇒ always ≥2 join
  * rounds) vs new (cached seed, baseline = seed's label sum ⇒ converges
  * after 1 round on pair/triple components, kernel pipeline materialized
  * exactly once). Both are followed by the same localCheckpoint tail.
  */
object R21Probe5 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("r21probe5", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._

    def edgesDf(): DataFrame = {
      val pairs = graft.operators.Dedup.minhashDedup(spark, dir).select($"doc_a", $"doc_b")
      pairs.union(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
        .toDF("src", "dst").cache()
    }

    def finish(spark: SparkSession, labels: DataFrame, edges: DataFrame): DataFrame = {
      val projected = labels.select($"doc_id", $"lbl".as("cluster_rep")).orderBy($"doc_id")
      val out = projected.localCheckpoint()
      edges.unpersist(); labels.unpersist()
      out
    }

    def oldD09(): DataFrame = {
      val edges = edgesDf()
      var labels = edges.groupBy($"src").agg(min($"dst").as("n0"))
        .select($"src".as("doc_id"), least($"src", $"n0").as("lbl"))
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
      finish(spark, labels, edges)
    }

    def newD09(): DataFrame = graft.operators.Dedup.neardupClusters(spark, dir)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "d09 old" -> (() => oldD09()),
      "d09 new" -> (() => newD09()))
    SparkEntry.entry(spark).count()
    (1 to 4).foreach { round =>
      variants.foreach { case (name, q) =>
        val t0 = System.nanoTime()
        val df = q()
        val n = df.count()
        val h = df.collect().map(_.toString).mkString("|").hashCode
        println(f"PERF $name round$round ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n hash=$h")
      }
    }
    spark.stop()
  }
}
