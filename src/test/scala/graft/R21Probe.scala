package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (r21): A/B-time d13 variants in one warm session to
  * attribute the repartition vs thresholded-levenshtein deltas. */
object R21Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("r21probe", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._

    def d13(repart: Boolean, thresholded: Boolean): DataFrame = {
      val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
      val bands0 = docs
        .select($"doc_id", posexplode(
          graft.functions.GraftFunctions.chargramBands(spark, $"text", 8, 64, 16)))
        .toDF("doc_id", "band_idx", "band_key")
      val bands = if (repart) bands0.repartition($"band_idx", $"band_key") else bands0
      val candidates = bands.as("a")
        .join(bands.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
      val joined = candidates
        .join(docs.select($"doc_id".as("doc_a"), $"text".as("t_a")), "doc_a")
        .join(docs.select($"doc_id".as("doc_b"), $"text".as("t_b")), "doc_b")
        .withColumn("max_len", greatest(length($"t_a"), length($"t_b")))
        .filter(abs(length($"t_a") - length($"t_b")) * 10 <= $"max_len")
      val verified =
        if (thresholded)
          joined.withColumn("edit_dist",
              expr("levenshtein(t_a, t_b, greatest(length(t_a), length(t_b)) DIV 10)"))
            .filter($"edit_dist" >= 0)
        else
          joined.withColumn("edit_dist", levenshtein($"t_a", $"t_b"))
            .filter($"edit_dist" * 10 <= $"max_len")
      verified.select($"doc_a", $"doc_b", $"edit_dist", $"max_len")
        .orderBy($"doc_a", $"doc_b")
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "orig(noRepart,fullLev)" -> (() => d13(repart = false, thresholded = false)),
      "repartOnly" -> (() => d13(repart = true, thresholded = false)),
      "threshOnly" -> (() => d13(repart = false, thresholded = true)),
      "both(current)" -> (() => d13(repart = true, thresholded = true)))
    SparkEntry.entry(spark).count()
    (1 to 3).foreach { round =>
      variants.foreach { case (name, q) =>
        val t0 = System.nanoTime()
        q().count()
        println(f"PERF d13/$name round$round ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
