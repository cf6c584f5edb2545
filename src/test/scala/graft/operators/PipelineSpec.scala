package graft.operators

import graft.SparkSpec
import graft.functions.TextAlgos

/** Training-data operator specs: kernel determinism + plan-level behavior
  * at sf0.001 (the documents/embeddings tables are identical across sf). */
class PipelineSpec extends SparkSpec {

  test("kernels are deterministic and shingle-sensitive") {
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "the quick brown fox jumps over the lazy cat"
    assert(TextAlgos.fingerprint64(a) == TextAlgos.fingerprint64(a))
    assert(TextAlgos.fingerprint64(a) != TextAlgos.fingerprint64(b))
    // formatting-insensitive fingerprint
    assert(TextAlgos.fingerprint64("The  Quick\tBrown fox JUMPS over the lazy dog ") ==
      TextAlgos.fingerprint64(a))
    assert(TextAlgos.simHash64(a, 3) != TextAlgos.simHash64(b, 3))
    assert(TextAlgos.hammingDistance(TextAlgos.simHash64(a, 3), TextAlgos.simHash64(b, 3)) < 24,
      "one-word edit should stay simhash-close")
    val sigA = TextAlgos.minHashSignature(a, 3, 64)
    assert(sigA.length == 64 && sigA.sameElements(TextAlgos.minHashSignature(a, 3, 64)))
  }

  test("minhash estimates jaccard: identical docs agree on all hashes") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val sigA = TextAlgos.minHashSignature(a, 3, 64)
    val sigA2 = TextAlgos.minHashSignature(a, 3, 64)
    assert(sigA.zip(sigA2).count { case (x, y) => x == y } == 64)
    val b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 zz"
    val sigB = TextAlgos.minHashSignature(b, 3, 64)
    val agree = sigA.zip(sigB).count { case (x, y) => x == y }
    assert(agree > 20 && agree < 64, s"partial overlap should partially agree, got $agree/64")
  }

  test("lang_id: CJK detection and stopword profiles") {
    assert(TextAlgos.langId("你好 世界 这是 一个 测试 文本 再见") == "zh")
    assert(TextAlgos.langId("the cat is on the roof and the dog is in the yard") == "en")
    assert(TextAlgos.langId("le chat est sur le toit et les chiens") == "fr")
    assert(TextAlgos.langId("") == "und")
  }

  test("minhash-LSH dedup finds exactly the brute-force pairs (recall 1.0)") {
    val lsh = Dedup.minhashDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force within Spark: exact jaccard over all pairs via the same
    // shingle sets (500 docs -> 125k pairs, fine locally)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", graft.functions.GraftFunctions.shingleHashes(spark, $"text", 3).as("sh"))
    val brute = docs.as("a").join(docs.as("b"), $"a.doc_id" < $"b.doc_id")
      .withColumn("i", size(array_intersect($"a.sh", $"b.sh")))
      .withColumn("j", $"i".cast("double") / (size($"a.sh") + size($"b.sh") - $"i"))
      .filter($"j" >= 0.8)
      .select($"a.doc_id", $"b.doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"LSH found ${lsh.size}, brute force ${brute.size}")
    assert(brute.nonEmpty, "testdata should contain planted near-dup pairs")
  }

  test("simhash pairs: near-dups fall within hamming<=3 and pairs are found") {
    val rows = Dedup.simhashPairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("hamming") <= 3))
  }

  test("ann lsh on testdata: deterministic, exact re-rank, no self-matches") {
    // Recall is asserted on planted CLUSTERED data in SimilaritySpec (>=0.8
    // with <5% of the corpus probed); the testdata embeddings are
    // uniform-random — LSH's adversarial case — so here we assert the
    // operator's structural contract instead: cosines are exact re-ranks
    // (match brute force per pair), ranks descend, output is stable.
    val exactByPair = Similarity.annBruteForce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val rows = Similarity.annLsh(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val cosines = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
    }
    // any (query, neighbor) pair also in the exact top-5 must carry the
    // identical double — the re-rank computes true cosine, not an estimate
    rows.foreach { r =>
      exactByPair.get((r.getLong(0), r.getLong(2)))
        .foreach(c => assert(c == r.getDouble(3)))
    }
    val again = Similarity.annLsh(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("brute-force ann: 5 queries x 5 ranked neighbors, no self-matches") {
    val rows = Similarity.annBruteForce(spark, sfDir).collect()
    assert(rows.length == 25)
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val cosines = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
    }
  }

  test("multimodal stub pipeline is deterministic and schema-complete") {
    val a = Multimodal.mediaRecords(spark, sfDir).collect()
    val b = Multimodal.mediaRecords(spark, sfDir).collect()
    assert(a.length == 500)
    assert(a.map(_.getAs[Long]("feature_hash")).toSeq == b.map(_.getAs[Long]("feature_hash")).toSeq)
    assert(a.forall(r => Set("png", "jpeg", "wav").contains(r.getAs[String]("format"))))
    assert(a.forall(r => r.getAs[Int]("byte_len") > 0))
  }

  test("extensions: graft functions resolve from pure SQL") {
    val r = spark.sql(
      "SELECT graft_lang_id('the cat is on the roof and the dog is here') AS lang, " +
        "graft_fingerprint64('hello world') AS fp, " +
        "graft_iceberg_bucket(34L, 16) AS bl, " +
        "graft_iceberg_bucket('iceberg', 16) AS bs").collect().head
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == graft.functions.TextAlgos.fingerprint64("hello world"))
    // Iceberg spec vectors through the codegen'd SQL path (long + string)
    assert(r.getInt(2) == (2017239379 & Int.MaxValue) % 16)
    assert(r.getInt(3) == (1210000089 & Int.MaxValue) % 16)
  }

  test("partitioned parquet sink roundtrip (directory layout by column)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.exists(_.startsWith("lang=")))
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // partition pruning: a lang filter must prune to one directory
    val plan = back.filter($"lang" === "en").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), s"no partition filter in:\n$plan")
  }

  test("codegen: custom expressions evaluate inside whole-stage codegen") {
    import spark.implicits._
    val df = graft.Tables.load(spark, sfDir, "documents")
      .select(graft.functions.GraftFunctions.fingerprint64(spark, $"text").as("fp"))
    // the "*(n)" operator prefix is the WholeStageCodegen marker in the
    // compact plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [fingerprint64"), s"expected codegen'd projection in:\n$plan")
  }

  test("codegen: the dot-product kernel stays inside whole-stage codegen") {
    import spark.implicits._
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val df = emb.select(
      graft.functions.GraftFunctions.dot(spark, $"embedding", $"embedding").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), s"dot fell out of codegen:\n$plan")
    // sanity: self-dot equals the squared norm computed driver-side
    val row = emb.select($"embedding").head.getSeq[Float](0)
    val expect = row.map(x => x.toDouble * x.toDouble).sum
    assert(df.head.getDouble(0) == expect)
  }

  test("AQE splits a skewed join at runtime (skew-safe shape)") {
    import spark.implicits._
    // one hot key carrying ~all rows (with a payload so the partition has
    // real bytes) vs a flat build side; no aligned aggregation downstream,
    // or AQE would refuse to split the partitioning the agg relies on
    val pad = "x" * 100
    val hot = (0 until 60000).map(i => (if (i % 100 == 0) i.toLong else 7L, pad + i))
      .toDF("k", "v")
    val dim = (0L until 1000L).map(k => (k, s"d$k")).toDF("k", "name")
    val prev = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // keep the payload in the join output, else column pruning empties
      // the skewed partition back below the threshold
      val joined = hot.join(dim, "k").select($"k", $"v", $"name")
      joined.collect() // AQE decides at runtime — materialize first
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), s"no skew split in final plan:\n$finalPlan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("d11 reuses the per-pair shuffle: corpus scanned once at runtime") {
    // both output branches (dup positions, total positions) hang off the
    // same (shingle, doc) rollup — AQE must reuse that shuffle stage
    // rather than re-running the scan + kernel + partial aggregate
    val df = Dedup.dupPassages(spark, sfDir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert("(?i)reused".r.findFirstIn(finalPlan).isDefined,
      s"no reused exchange/stage in final plan:\n$finalPlan")
  }
}
