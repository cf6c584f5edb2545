package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev utility (r21): BIT-equality of the pre-r21 formulations against the
  * committed entries at an arbitrary scale (default sf0.1 — the bench
  * scale, where the sf0.01 oracle gate does not reach). Old formulations
  * are replicated verbatim from the r20 tree. */
object R21Equality {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("r21eq", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._
    import graft.functions.GraftFunctions

    def d03Old(): DataFrame = {
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
        .select($"doc_a", $"doc_b", $"jaccard")
        .orderBy($"doc_a", $"doc_b")
    }

    def d05Old(): DataFrame = {
      val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
      val grams = docs
        .select($"doc_id", GraftFunctions.chargramHashes(spark, $"text", 8).as("grams"))
      val bands = docs
        .select($"doc_id", posexplode(GraftFunctions.chargramBands(spark, $"text", 8, 64, 16)))
        .toDF("doc_id", "band_idx", "band_key")
      val candidates = bands.as("a")
        .join(bands.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
      candidates
        .join(grams.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("grams", "g_a"), "doc_a")
        .join(grams.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("grams", "g_b"), "doc_b")
        .withColumn("i", size(array_intersect($"g_a", $"g_b")))
        .withColumn("jaccard", $"i".cast("double") / (size($"g_a") + size($"g_b") - $"i"))
        .filter($"jaccard" >= 0.8)
        .select($"doc_a", $"doc_b", $"jaccard")
        .orderBy($"doc_a", $"doc_b")
    }

    def d04Old(): DataFrame = {
      val docs = Tables.load(spark, dir, "documents")
        .select($"doc_id", GraftFunctions.simhash64(spark, $"text", 3).as("sh"))
      val chunks = docs.select($"doc_id", $"sh",
        posexplode(array((0 until 4).map(i =>
          $"sh".bitwiseAND(lit(0xffffL << (i * 16)))): _*)))
        .toDF("doc_id", "sh", "chunk_idx", "chunk")
      chunks.as("a")
        .join(chunks.as("b"),
          $"a.chunk_idx" === $"b.chunk_idx" && $"a.chunk" === $"b.chunk" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
          $"a.sh".as("sh_a"), $"b.sh".as("sh_b"))
        .distinct()
        .withColumn("hamming", bit_count($"sh_a".bitwiseXOR($"sh_b")))
        .filter($"hamming" <= 3)
        .select($"doc_a", $"doc_b", $"hamming")
        .orderBy($"doc_a", $"doc_b")
    }

    def t09Old(): DataFrame = {
      val norm = GraftFunctions.normalizeText(spark, $"text")
      val words = Tables.load(spark, dir, "documents")
        .select(split(norm, " ").as("ws")).filter(size($"ws") >= 2)
      val bigrams = words
        .select(explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))")).as("b"))
        .select($"b.w1", $"b.w2")
        .filter(length($"w1") > 0 && length($"w2") > 0)
      val counts = bigrams.groupBy($"w1", $"w2").agg(count(lit(1)).as("n"))
      val context = counts.groupBy($"w1").agg(sum($"n").as("n_ctx"))
      counts.join(context, "w1")
        .select($"w1", $"w2", $"n", ($"n".cast("double") / $"n_ctx".cast("double")).as("p_cond"))
        .orderBy($"n".desc, $"w1", $"w2").limit(20)
    }

    def t11Old(): DataFrame = {
      val norm = GraftFunctions.normalizeText(spark, $"text")
      val docs = Tables.load(spark, dir, "documents")
      val nDocs = docs.agg(countDistinct($"doc_id").as("n_docs"))
      val tf = docs.select($"doc_id", explode(split(norm, " ")).as("term"))
        .filter(length($"term") > 0)
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val scored = tf.join(df, "term").crossJoin(broadcast(nDocs))
        .withColumn("score", ($"tf" * $"n_docs").cast("double") / $"df")
      val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
      scored.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
        .select($"doc_id", $"term", $"score", $"rnk").orderBy($"doc_id", $"rnk")
    }

    val pairs: Seq[(String, () => DataFrame, String)] = Seq(
      ("d03_minhash_dedup", () => d03Old(), "d03_minhash_dedup"),
      ("d04_simhash_pairs", () => d04Old(), "d04_simhash_pairs"),
      ("d05_chargram_jaccard", () => d05Old(), "d05_chargram_jaccard"),
      ("t09_bigram_model", () => t09Old(), "t09_bigram_model"),
      ("t11_tfidf_terms", () => t11Old(), "t11_tfidf_terms"))
    var bad = 0
    pairs.foreach { case (name, old, entry) =>
      val o = old().collect().toSeq
      val n = SparkEntry.queries(entry)(spark, dir).collect().toSeq
      val ok = o == n
      if (!ok) bad += 1
      println(s"EQ $name rows_old=${o.size} rows_new=${n.size} identical=$ok")
    }
    // d09/d13/st04/s04/s05/s06/m08/m09/t14 are covered elsewhere:
    // EditDistanceBoundSpec (d13 old-vs-new on testdata),
    // SquaredDistanceSpec (bit-level kernel equality), st04 row-level
    // oracle, m08/m09 byte-identical codec path, t14 reverted verbatim.
    println(s"EQ SUMMARY mismatches=$bad")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
