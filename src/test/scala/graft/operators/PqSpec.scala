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

  test("lloydTrain repairs a degenerate codebook: quantization error, " +
      "alignment, and recall on planted clusters") {
    // The bad-codebook scenario lloydTrain exists to fix: 8 clusters but
    // only 4 distinct useful entries — entries 4-7 are near-duplicates of
    // entries 0-3 (nudged 8% off), so clusters 4-7 have no entry anywhere
    // near them. Training from those same seeds must (a) collapse the
    // QUANTIZATION ERROR — the k-means objective, and the codebook
    // quality measure PQ ranks candidates by — by a large factor, (b)
    // ALIGN the codebook with every planted cluster (an entry inside
    // each cluster's radius), and (c) keep end-to-end two-stage
    // retrieval recall perfect against exact ground truth.
    //
    // Recall with the DEGENERATE codebook is measured too, and training
    // must never be worse — but on well-separated clusters recall alone
    // under-reports codebook damage (queries and their neighbors are
    // near-identical vectors, so ANY deterministic assignment sends them
    // to the same probed cell, and the exact re-rank repairs the
    // ordering — established empirically across several adversarial
    // geometries): quantization error is the measure that discriminates,
    // exactly as in the PQ literature.
    val dim = 64
    val perCluster = 12
    def unit(seed: Long): Double = {
      val h = graft.functions.TextAlgos.splitmix64(seed)
      h.toDouble / Long.MaxValue.toDouble
    }
    def center(k: Int): Array[Float] =
      Array.tabulate(dim)(d => (4.0 * unit(k * 131L + d)).toFloat)
    def member(k: Int, id: Long): Array[Float] = {
      val c = center(k)
      Array.tabulate(dim)(d => c(d) + (0.3 * unit(id * 977L + d)).toFloat)
    }
    val rows = new scala.collection.mutable.ArrayBuffer[Row]
    // queries 0..4: member-like points of the UNSEEDED clusters 4..7
    for (q <- 0 until 5) rows += Row(q.toLong, member(4 + q % 4, 9000L + q).toSeq)
    var id = 5L
    for (k <- 0 until 8; j <- 0 until perCluster) {
      rows += Row(id, member(k, id).toSeq)
      id += 1
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-train").toString
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    corpus.write.parquet(s"$dir/embeddings.parquet")
    val degenerate: Array[Array[Double]] = Array.tabulate(8) { s =>
      if (s < 4) center(s).map(_.toDouble)
      else {
        val b = center(s - 4); val t = center(s)
        Array.tabulate(dim)(d => b(d) + 0.08 * (t(d) - b(d)))
      }
    }
    val trained = Similarity.lloydTrain(
      corpus, k = 8, dim = dim, iters = 8, seeds = Some(degenerate))
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    val all = rows.map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    // (a) quantization error: mean squared distance to nearest entry
    def qerr(cb: Array[Array[Double]]): Double =
      all.map(v => cb.map(c => d2(v._2, c)).min).sum / all.size
    val (qStale, qTrained) = (qerr(degenerate), qerr(trained))
    info(f"quantization error: degenerate $qStale%.2f, trained $qTrained%.2f")
    assert(qTrained * 50 < qStale,
      s"training must collapse quantization error: $qStale -> $qTrained")
    // (b) alignment: every planted cluster mean gets an entry inside its
    // radius; the degenerate codebook had none within 5 of clusters 4-7
    val clusterMeans = (0 until 8).map { k =>
      val ms = all.filter(v => v._1 >= 5 + k * perCluster && v._1 < 5 + (k + 1) * perCluster)
      Array.tabulate(dim)(d => ms.map(_._2(d)).sum / ms.size)
    }
    clusterMeans.zipWithIndex.foreach { case (m, k) =>
      val dT = math.sqrt(trained.map(c => d2(c, m)).min)
      assert(dT < 2.0, s"no trained entry near cluster $k (nearest $dT)")
    }
    (4 until 8).foreach { k =>
      val dS = math.sqrt(degenerate.map(c => d2(c, clusterMeans(k))).min)
      assert(dS > 5.0, s"scenario broken: degenerate entry near cluster $k ($dS)")
    }
    // (c) recall vs exact ground truth through the full two-stage
    // pipeline: trained is perfect, and never worse than degenerate
    val truth: Map[Long, Set[Long]] = (0L until 5L).map { q =>
      val qv = all.find(_._1 == q).get._2
      q -> all.filter(_._1 != q).sortBy(v => (d2(qv, v._2), v._1))
        .take(5).map(_._1).toSet
    }.toMap
    def recallOf(cb: Array[Array[Double]]): Double = {
      val top = Similarity.ivfPqRerankWith(spark, dir, cb).collect()
      top.count(r => truth(r.getLong(0)).contains(r.getLong(2))) / 25.0
    }
    val (rStale, rTrained) = (recallOf(degenerate), recallOf(trained))
    info(s"rerank recall: degenerate $rStale, trained $rTrained")
    assert(rTrained == 1.0, s"trained recall must be perfect, got $rTrained")
    assert(rTrained >= rStale, "training must never hurt recall")
  }

  test("farthest-point seeding beats anchor ids on a degenerate corpus " +
      "(all low vec_ids in one cluster) and the movement stop converges") {
    // The corpus that breaks "seed with the k lowest vec_ids": ids 0..7
    // are ALL members of planted cluster 0, so anchor seeding starts
    // every centroid inside one dense region and Lloyd can never
    // repopulate the other seven clusters (a centroid only moves where
    // it has members). Farthest-point seeding spreads by construction —
    // each pick maximizes distance to the chosen set — so every planted
    // cluster gets a seed and training aligns all eight.
    val dim = 64
    val perCluster = 12
    def unit(seed: Long): Double = {
      val h = graft.functions.TextAlgos.splitmix64(seed)
      h.toDouble / Long.MaxValue.toDouble
    }
    def center(k: Int): Array[Float] =
      Array.tabulate(dim)(d => (4.0 * unit(k * 131L + d)).toFloat)
    def member(k: Int, id: Long): Array[Float] = {
      val c = center(k)
      Array.tabulate(dim)(d => c(d) + (0.3 * unit(id * 977L + d)).toFloat)
    }
    val rows = new scala.collection.mutable.ArrayBuffer[Row]
    // ids 0..7: extra members of cluster 0 — the anchor-seed trap
    for (q <- 0 until 8) rows += Row(q.toLong, member(0, 5000L + q).toSeq)
    var id = 8L
    for (k <- 0 until 8; j <- 0 until perCluster) {
      rows += Row(id, member(k, id).toSeq)
      id += 1
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val all = rows.map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    def qerr(cb: Array[Array[Double]]): Double =
      all.map(v => cb.map(c => d2(v._2, c)).min).sum / all.size

    // the seeds themselves spread: one inside each planted cluster
    val fps = Similarity.farthestPointSeeds(corpus, 8)
    val seedClusters = fps.map(s =>
      (0 until 8).minBy(k => d2(s, center(k).map(_.toDouble)))).toSet
    assert(seedClusters.size == 8,
      s"farthest-point seeds must cover all planted clusters: $seedClusters")

    // trained quality: anchor-id seeding collapses, k-center seeding
    // aligns every cluster — and never does worse
    val (anchorTrained, _) = Similarity.lloydTrainCounted(
      corpus, k = 8, dim = dim, maxIters = 8)
    val (fpsTrained, itersRun) = Similarity.lloydTrainCounted(
      corpus, k = 8, dim = dim, maxIters = 50, seeds = Some(fps))
    val (qAnchor, qFps) = (qerr(anchorTrained), qerr(fpsTrained))
    info(f"quantization error: anchor-seeded $qAnchor%.3f, k-center $qFps%.3f")
    assert(qFps * 10 < qAnchor,
      s"k-center seeding must beat collapsed anchor seeds: $qAnchor vs $qFps")
    (0 until 8).foreach { k =>
      val c = center(k).map(_.toDouble)
      val dNear = math.sqrt(fpsTrained.map(e => d2(e, c)).min)
      assert(dNear < 2.0, s"no trained entry near planted cluster $k ($dNear)")
    }

    // the movement-based stop: converged well before the 50-cap, and a
    // fixed point really is fixed — training on from the converged
    // codebook moves nothing and stops after one probe iteration
    assert(itersRun < 50, s"movement stop never fired ($itersRun iterations)")
    val (again, probeIters) = Similarity.lloydTrainCounted(
      corpus, k = 8, dim = dim, maxIters = 50, seeds = Some(fpsTrained))
    assert(probeIters == 1, s"fixed point must stop immediately: $probeIters")
    assert(again.zip(fpsTrained).forall { case (a, b) =>
      java.util.Arrays.equals(a, b) }, "fixed point must not move")
  }

  test("k-means|| oversampling seeds every planted cluster within the " +
      "O(log k) scan bound — the large-k bootstrap path") {
    // same anchor-trap corpus as the farthest-point test: ids 0..7 all
    // in planted cluster 0, eight well-separated clusters of 12
    val dim = 64
    val perCluster = 12
    def unit(seed: Long): Double = {
      val h = graft.functions.TextAlgos.splitmix64(seed)
      h.toDouble / Long.MaxValue.toDouble
    }
    def center(k: Int): Array[Float] =
      Array.tabulate(dim)(d => (4.0 * unit(k * 131L + d)).toFloat)
    def member(k: Int, id: Long): Array[Float] = {
      val c = center(k)
      Array.tabulate(dim)(d => c(d) + (0.3 * unit(id * 977L + d)).toFloat)
    }
    val rows = new scala.collection.mutable.ArrayBuffer[Row]
    for (q <- 0 until 8) rows += Row(q.toLong, member(0, 5000L + q).toSeq)
    var id = 8L
    for (k <- 0 until 8; j <- 0 until perCluster) {
      rows += Row(id, member(k, id).toSeq)
      id += 1
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val all = rows.map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    def qerr(cb: Array[Array[Double]]): Double =
      all.map(v => cb.map(c => d2(v._2, c)).min).sum / all.size

    val k = 8
    val (seeds, scans) = Similarity.kmeansParallelSeeds(corpus, k)
    // the scan bound that makes this the large-k path: 1 seed pass +
    // 2 per round (rounds = ceil(log2 k)+1) + at most 1 top-up —
    // O(log k), where farthest-point takes k sequential passes
    val r = 32 - Integer.numberOfLeadingZeros(k - 1) + 1
    assert(scans <= 2 * r + 2, s"$scans corpus passes exceed the O(log k) bound")
    info(s"k-means|| used $scans corpus passes (farthest-point: $k)")
    // seed quality: every planted cluster gets a seed, same as k-center
    val seedClusters = seeds.map(s =>
      (0 until 8).minBy(c => d2(s, center(c).map(_.toDouble)))).toSet
    assert(seedClusters.size == 8,
      s"k-means|| seeds must cover all planted clusters: $seedClusters")
    // trained quality: equal-or-better than the collapsed anchor seeding,
    // every planted center recovered — the same recall bar the
    // farthest-point test sets
    val (anchorTrained, _) = Similarity.lloydTrainCounted(
      corpus, k = 8, dim = dim, maxIters = 8)
    val (parTrained, _) = Similarity.lloydTrainCounted(
      corpus, k = 8, dim = dim, maxIters = 50, seeds = Some(seeds))
    val (qAnchor, qPar) = (qerr(anchorTrained), qerr(parTrained))
    info(f"quantization error: anchor-seeded $qAnchor%.3f, k-means|| $qPar%.3f")
    assert(qPar * 10 < qAnchor,
      s"k-means|| seeding must beat collapsed anchor seeds: $qAnchor vs $qPar")
    (0 until 8).foreach { c =>
      val ctr = center(c).map(_.toDouble)
      val dNear = math.sqrt(parTrained.map(e => d2(e, ctr)).min)
      assert(dNear < 2.0, s"no trained entry near planted cluster $c ($dNear)")
    }
    // the production trainer's dispatch: k=8 ≤ SeedScanCutover routes
    // through farthest-point — byte-identical to seeding it explicitly
    assert(k <= Similarity.SeedScanCutover)
    val viaTrainer = Similarity.trainKMeans(corpus, k, dim, maxIters = 50)
    val viaExplicit = Similarity.lloydTrain(corpus, k, dim, iters = 50,
      seeds = Some(Similarity.farthestPointSeeds(corpus, k)))
    assert(viaTrainer.zip(viaExplicit).forall { case (a, b) =>
      java.util.Arrays.equals(a, b) },
      "trainKMeans below the cutover must be the farthest-point route")
  }
}
