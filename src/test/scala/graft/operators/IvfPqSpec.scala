package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** IVF-PQ on PLANTED clusters (the s05 analogue of PqSpec): eight
  * well-separated centers double as both the coarse-quantizer centroids
  * and the PQ codebook anchors, members hug their center, so
  *   - every member's coarse CELL is its own cluster,
  *   - every member's four PQ codes collapse to its center,
  *   - a center-query's nearest probe is its own cell, and ADC to a
  *     same-cluster member is exactly 0 —
  * which makes retrieval deterministic: top-5 must be same-cluster
  * members at ADC 0, reported from the query's own cell. The probe cut
  * is also pinned structurally: with nprobe=2 of 8 cells, members of the
  * six unprobed clusters are never candidates at all. */
class IvfPqSpec extends SparkSpec {

  test("probes select the home cell; retrieval is same-cluster at ADC zero") {
    val dim = 64
    val perCluster = 10
    def unit(seed: Long): Double = {
      val h = graft.functions.TextAlgos.splitmix64(seed)
      h.toDouble / Long.MaxValue.toDouble
    }
    def center(k: Int): Array[Float] =
      Array.tabulate(dim)(d => (4.0 * unit(k * 131L + d)).toFloat)
    val rows = new scala.collection.mutable.ArrayBuffer[Row]
    for (k <- 0 until 8) rows += Row(k.toLong, center(k).toSeq)
    var id = 8L
    for (k <- 0 until 8; j <- 0 until perCluster) {
      val c = center(k)
      rows += Row(id, Array.tabulate(dim)(d =>
        c(d) + (0.01 * unit(id * 977L + d)).toFloat).toSeq)
      id += 1
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
      .write.parquet(s"$dir/embeddings.parquet")

    val top = Similarity.queries("s05_ivf_pq")(spark, dir).collect()
    assert(top.length == 25) // 5 queries x top-5
    val labelOf: Long => Int = vid =>
      if (vid < 8) vid.toInt else ((vid - 8) / perCluster).toInt
    top.foreach { r =>
      val (q, n, cell) = (r.getLong(0), r.getLong(2), r.getInt(3))
      assert(labelOf(n) == labelOf(q),
        s"query $q (cluster ${labelOf(q)}) retrieved $n from cluster ${labelOf(n)}")
      assert(cell == labelOf(q),
        s"neighbor $n of query $q reported from cell $cell, not the home cell")
      assert(r.getDouble(4) == 0.0,
        s"ADC for same-cluster member: ${r.getDouble(4)}")
    }

    // s06 refine on the same planted data: still same-cluster, but the
    // returned distances are EXACT — strictly positive (members are
    // perturbed off their center, so ADC's collapsed-to-centroid zero is
    // a quantization artifact the re-rank removes) and tiny vs the
    // inter-cluster scale
    val reranked = Similarity.queries("s06_ivfpq_rerank")(spark, dir).collect()
    assert(reranked.length == 25)
    reranked.foreach { r =>
      val (q, n, d2) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      assert(labelOf(n) == labelOf(q),
        s"refined query $q retrieved $n from cluster ${labelOf(n)}")
      assert(d2 > 0.0 && d2 < 0.01,
        s"exact member distance should be tiny but nonzero, got $d2")
    }
  }
}
