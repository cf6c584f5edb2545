package graft.operators

import graft.SparkSpec

/** Plan-shape pins for the corpus-assembly and PQ entries: the scale
  * story each one's scaladoc tells must be visible in the executed
  * plan, not just asserted in prose. */
class CorpusShapeSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // AQE finalizes the executed plan only after an action
    // AdaptiveSparkPlan.toString prints the FINAL plan followed by the
    // pre-AQE initial plan — count shapes in the final section only
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("t15 packing: one keyed shuffle feeds both the window and the rollup") {
    val plan = planOf(TextPipeline.queries("t15_sequence_packing")(spark, sfDir))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected ONE source-keyed shuffle (window + groupBy share it), got $hashExchanges:\n" +
        plan.take(2000))
  }

  test("t16 mixture: the quota side broadcasts, the corpus is never re-shuffled for it") {
    val plan = planOf(TextPipeline.queries("t16_domain_mixture")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      "the KB-scale quota table must broadcast:\n" + plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      "a sort-merge join would shuffle the corpus for a KB-scale build side")
  }

  test("t17 decontamination: the benchmark n-gram set broadcasts; the corpus never sort-merges") {
    val plan = planOf(TextPipeline.queries("t17_decontamination")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      "the MB-scale benchmark gram set must broadcast:\n" + plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      "a sort-merge join would shuffle the whole corpus's gram stream")
  }

  test("s05 IVF-PQ: the probe join is an equi-join on cell, not a cross product") {
    val plan = planOf(Similarity.queries("s05_ivf_pq")(spark, sfDir))
    // s04 scores every (query, vector) pair through a BroadcastNestedLoop
    // cross; the IVF leg's whole point is that s05 does NOT — candidates
    // come from a broadcast HASH join on the cell id, so only probed
    // cells' members are ever scored
    assert(plan.contains("BroadcastHashJoin"),
      "the probe list must broadcast-hash-join on cell:\n" + plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "a nested-loop join would score every pair — the IVF cut is gone")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      "the coded corpus must not shuffle for the KB-scale probe side")
  }

  test("s06 refine: both stages stay broadcast hash joins — codes shortlist, vectors fetch") {
    val plan = planOf(Similarity.queries("s06_ivfpq_rerank")(spark, sfDir))
    // stage 1 joins probes to the coded corpus on cell, stage 2 fetches
    // full vectors for the broadcast shortlist on vec_id — neither may
    // degenerate to a cross product or shuffle the corpus
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "both the probe join and the refine fetch must broadcast-hash-join:\n" +
        plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      "no cross product and no corpus shuffle in either stage")
  }

  test("s04 PQ: queries broadcast; codes are computed pre-join, not per pair") {
    val df = Similarity.queries("s04_pq_adc")(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the 5-query set must broadcast across the coded corpus:\n" + plan.take(2000))
    // the code columns (c0..c3 argmins over the codebook) must be
    // projected BELOW the join: scoring a candidate reads its 4 codes,
    // never re-derives them per query pair
    val joinIdx = plan.indexOf("BroadcastNestedLoopJoin")
    val codeIdx = plan.indexOf("array_position")
    assert(codeIdx > joinIdx && joinIdx >= 0,
      "code assignment must sit under the join in the plan tree " +
        s"(join at $joinIdx, codes at $codeIdx)")
  }
}
