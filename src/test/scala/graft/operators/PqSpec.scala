package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** PQ/ADC on PLANTED clusters, where the codebook is meaningful (the
  * oracle-gated s04 entry runs over uniform-random testdata, which
  * exercises the mechanics but not retrieval quality): eight
  * well-separated centers, tight members, centers as the anchor rows —
  * every member must code to its own cluster in all four subspaces, so
  * ADC from a center-query must retrieve exclusively same-cluster
  * members. Deterministic data → deterministic assertion, no recall
  * flakiness. */
class PqSpec extends SparkSpec {

  test("ADC retrieves from the planted cluster; codes collapse to the center") {
    val dim = 64
    val perCluster = 10
    def unit(seed: Long): Double = {
      val h = graft.functions.TextAlgos.splitmix64(seed)
      h.toDouble / Long.MaxValue.toDouble
    }
    // centers well separated (coordinates in [-4, 4]); members hug them
    def center(k: Int): Array[Float] =
      Array.tabulate(dim)(d => (4.0 * unit(k * 131L + d)).toFloat)
    val rows = new scala.collection.mutable.ArrayBuffer[Row]
    for (k <- 0 until 8) rows += Row(k.toLong, center(k).toSeq, k)
    var id = 8L
    for (k <- 0 until 8; j <- 0 until perCluster) {
      val c = center(k)
      rows += Row(id, Array.tabulate(dim)(d =>
        c(d) + (0.01 * unit(id * 977L + d)).toFloat).toSeq, k)
      id += 1
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
      .write.parquet(s"$dir/embeddings.parquet")

    val top = Similarity.queries("s04_pq_adc")(spark, dir).collect()
    assert(top.length == 25) // 5 queries x top-5
    val labelOf: Long => Int = vid =>
      if (vid < 8) vid.toInt else ((vid - 8) / perCluster).toInt
    top.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(2))
      assert(labelOf(n) == labelOf(q),
        s"query $q (cluster ${labelOf(q)}) retrieved $n from cluster ${labelOf(n)}")
      // center-query to same-cluster member: ADC is the distance to the
      // member's CODE centroid = the query itself → exactly zero
      assert(r.getDouble(3) == 0.0, s"ADC for same-cluster member: ${r.getDouble(3)}")
    }
  }
}
