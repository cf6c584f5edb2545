package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAlgos.splitmix64

/** Multi-probe LSH ANN (s02) and IVF-blocked near-dup (d07) on PLANTED
  * clustered embeddings — the testdata embeddings are uniform-random
  * (neighbors at cosine ≈ 0.4, LSH's adversarial case), so the recall and
  * sub-linearity guarantees are asserted here on data with the cluster
  * structure real embedding corpora have. Everything is splitmix64-seeded:
  * one green run pins the assertion forever.
  */
class SimilaritySpec extends SparkSpec {

  private val Dim = 64

  /** (-1,1) uniform from a seed. */
  private def u(seed: Long): Double = splitmix64(seed).toDouble / Long.MaxValue.toDouble

  /** `clusters` × `perCluster` vectors: cluster center + noise·uniform.
    * noise 0.33 ⇒ intra-cluster cosine ≈ 0.95; 0.05 ⇒ ≥ 0.995. */
  private def planted(clusters: Int, perCluster: Int, noise: Double, seed: Long): DataFrame = {
    import spark.implicits._
    (0 until clusters).flatMap { c =>
      val center = Array.tabulate(Dim)(d => u(seed + c * 7919L + d))
      (0 until perCluster).map { m =>
        val id = (c * perCluster + m).toLong
        val v = Array.tabulate(Dim)(d =>
          (center(d) + noise * u(seed + 1000003L * id + d)).toFloat)
        (id, v)
      }
    }.toDF("vec_id", "embedding")
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
    }
    dot / math.sqrt(na * nb)
  }

  test("s02 multi-probe LSH: recall@5 >= 0.8 vs brute force, <5% of corpus probed") {
    val n = 2000
    val corpus = planted(clusters = 100, perCluster = 20, noise = 0.33, seed = 42L)
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val queryIds = (0 until 20).map(c => (c * 20).toLong) // first member of 20 clusters
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb"))

    // exact ground truth, driver-side
    val trueTop5: Map[Long, Set[Long]] = queryIds.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .map(id => id -> cos(vecs(q), vecs(id))).sortBy { case (id, c) => (-c, id) }
        .take(5).map(_._1).toSet
    }.toMap

    val lsh = Similarity.annLshGeneric(corpus, queries, k = 5,
      nBits = 12, lowBits = 6, maxFlips = 3, dim = Dim)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap

    val recall = queryIds.map(q =>
      lsh.getOrElse(q, Set.empty).intersect(trueTop5(q)).size / 5.0).sum / queryIds.size
    assert(recall >= 0.8, s"recall@5 = $recall")

    val candidates = Similarity.lshCandidates(corpus, queries,
      nBits = 12, lowBits = 6, maxFlips = 3, dim = Dim).count()
    val fraction = candidates.toDouble / (queryIds.size.toLong * n)
    assert(fraction < 0.05, s"probed fraction = $fraction")
  }

  test("d07 IVF blocking: planted near-dup pairs recovered exactly, <5% of pair space examined") {
    val n = 1000
    // 500 planted pairs at cosine >= 0.99
    val corpus = planted(clusters = 500, perCluster = 2, noise = 0.05, seed = 7L)
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

    val cands = Dedup.ivfCandidatePairs(corpus, nBits = 12, maxFlips = 2, dim = Dim)
    val candSet = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute-force ground truth: every pair at cosine >= 0.99
    val truePairs = (for {
      a <- 0L until n; b <- (a + 1) until n
      if cos(vecs(a), vecs(b)) >= 0.99
    } yield (a, b)).toSet
    assert(truePairs.size >= 400, s"planted-pair generator sanity: ${truePairs.size}")
    val missed = truePairs -- candSet
    assert(missed.isEmpty, s"IVF missed ${missed.size} of ${truePairs.size} planted pairs: ${missed.take(5)}")

    val fraction = candSet.size.toDouble / (n.toLong * (n - 1) / 2)
    assert(fraction < 0.05, s"candidate pair fraction = $fraction")
  }
}
