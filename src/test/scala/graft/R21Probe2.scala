package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev utility (r21): warm A/B of the OLD formulations of d03/t09/t11/t14
  * against the committed NEW ones, to separate host drift from real
  * regressions in the full-pass comparison. */
object R21Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("r21probe2", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._
    import graft.functions.GraftFunctions

    // ---- OLD d03: broadcast self-join, kernel per side
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

    // ---- OLD t09: groupBy + join back
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

    // ---- OLD t11: groupBy + join back
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

    // ---- OLD t14: raw bigram stream joined per occurrence
    def t14Old(): DataFrame = {
      val norm = GraftFunctions.normalizeText(spark, $"text")
      val docs = Tables.load(spark, dir, "documents")
        .select($"doc_id", $"source", split(norm, " ").as("ws"))
        .filter(size($"ws") >= 2)
      val bg = docs.select($"doc_id", $"source", explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))")).as("b"))
        .select($"doc_id", $"source", $"b.w1", $"b.w2")
        .filter(length($"w1") > 0 && length($"w2") > 0)
      val counts = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("n"))
      val ctx = counts.groupBy($"w1").agg(sum($"n").as("n_ctx"))
      val scored = bg.join(counts, Seq("w1", "w2")).join(ctx, Seq("w1"))
        .groupBy($"doc_id", $"source")
        .agg(sum(expr("(n * 1000000) DIV n_ctx")).as("s"), count(lit(1)).as("nb"))
        .withColumn("score", expr("s DIV nb"))
      scored.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          min($"score").as("min_score"), max($"score").as("max_score"),
          expr("SUM(score) DIV COUNT(1)").as("avg_score"),
          sum(when($"score" >= 36000L, 1L).otherwise(0L)).as("n_head"),
          sum(when($"score" < 33000L, 1L).otherwise(0L)).as("n_tail"))
        .orderBy($"source")
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "d03-old" -> (() => d03Old()),
      "d03-new" -> (() => SparkEntry.queries("d03_minhash_dedup")(spark, dir)),
      "t09-old" -> (() => t09Old()),
      "t09-new" -> (() => SparkEntry.queries("t09_bigram_model")(spark, dir)),
      "t11-old" -> (() => t11Old()),
      "t11-new" -> (() => SparkEntry.queries("t11_tfidf_terms")(spark, dir)),
      "t14-old" -> (() => t14Old()),
      "t14-new" -> (() => SparkEntry.queries("t14_lm_quality_filter")(spark, dir)))
    SparkEntry.entry(spark).count()
    (1 to 3).foreach { round =>
      variants.foreach { case (name, q) =>
        val t0 = System.nanoTime()
        q().count()
        println(f"PERF $name round$round ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
