package graft

/** Dev utility: dump executed plans of representative queries for the
  * scale/efficiency audit (pushdown, broadcast, codegen spans). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("plan", "8")
    val dir = "/root/testdata/sf0.01"
    val targets = Map(
      "q03_join_topk" -> operators.Relational.q03JoinTopkRevenue,
      "q05_multi_join" -> operators.Relational.q05MultiJoin,
      "q02_filter_revenue" -> operators.Relational.q02FilterRevenue,
      "d03_minhash_dedup" -> operators.Dedup.minhashDedup,
      "s01_ann_brute_force" -> operators.Similarity.annBruteForce)
    targets.toSeq.sortBy(_._1).foreach { case (name, q) =>
      println(s"===== $name =====")
      println(q(spark, dir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
