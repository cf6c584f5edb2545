package graft

/** Dev utility: time individual queries twice in one warm session to
  * separate fixed session/codegen overhead from real compute. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("perf", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val targets = Seq(
      "st04_interval_join" -> streaming.EventStreams.streamIntervalJoin,
      "st03_session_window" -> streaming.EventStreams.streamSessionWindow,
      "d11_dup_passages" -> operators.Dedup.dupPassages,
      "d02_normalized_dedup" -> operators.Dedup.normalizedDedup,
      "q03_join_topk" -> operators.Relational.q03JoinTopkRevenue,
      "d04_simhash_pairs" -> operators.Dedup.simhashPairs,
      "q29_order_count_dist" -> operators.Relational2.orderCountDist)
    SparkEntry.entry(spark).count()
    targets.foreach { case (name, q) =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        q(spark, dir).count()
        println(f"PERF $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
