package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ADVICE r21 (medium): the integer cross-multiplied jaccard acceptance
  * `9i >= 4(sa+sb)` diverges from the old `jaccard >= 0.8` double filter
  * exactly when sa = sb = i = 0 — token-less documents get all-MaxValue
  * minhash signatures, so every such pair collides on EVERY band and
  * becomes a candidate with jaccard = 0/0 = NaN. The old filter dropped
  * the row (NaN >= 0.8 is false in IEEE), the oracle's shingle join never
  * produces the pair at all, and the r21 integer filter KEPT it (0 >= 0).
  * The r22 `sa + sb > 0` guard restores the drop; this spec builds the
  * degenerate corpus the testdata lacks and pins both entries. */
class EmptyDocGuardSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-emptydoc").toString
    val normal = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    Seq(
      (1L, "src", ""),            // token-less: empty text
      (2L, "src", "   "),         // token-less: whitespace only
      (3L, "src", "abc"),         // < 8 chars: empty chargram set
      (4L, "src", "abc"),         // identical short doc — collides with 3
      (10L, "src", normal),       // planted near-dup pair (jaccard 1.0,
      (11L, "src", normal)        //  > 8 chars, > 3 tokens)
    ).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("d03: token-less candidate pairs are dropped, real pairs survive, no NaN") {
    val rows = Dedup.minhashDedup(spark, dir).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((1L, 2L)),
      "empty-shingle pair must be dropped (old-filter + oracle semantics)")
    assert(rows.forall(r => !r.getDouble(2).isNaN), "no NaN jaccard may surface")
    assert(pairs.contains((10L, 11L)), "the planted near-dup pair must survive")
  }

  test("d05: sub-8-char candidate pairs are dropped, real pairs survive, no NaN") {
    val rows = Dedup.chargramJaccard(spark, dir).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((3L, 4L)),
      "empty-gram pair must be dropped (old-filter + oracle semantics)")
    assert(Seq((1L, 2L), (1L, 3L), (2L, 3L)).forall(p => !pairs.contains(p)))
    assert(rows.forall(r => !r.getDouble(2).isNaN), "no NaN jaccard may surface")
    assert(pairs.contains((10L, 11L)), "the planted near-dup pair must survive")
  }

  test("guarded integer filter == the old double filter on the degenerate corpus") {
    // replay d03's verify stage with BOTH acceptance tests over the same
    // candidate set: the guarded integer form and the pre-r21 double form
    // must keep identical rows here (the only divergence case is sa+sb=0).
    // Under ANSI mode (Spark 4 default) the raw 0/0 division THROWS
    // (DIVIDE_BY_ZERO) — i.e. the unguarded r21 filter didn't just keep a
    // NaN row, it made the whole entry fail on a degenerate corpus — so
    // the old form replays through try_divide (NULL ⇒ dropped, the same
    // rows the pre-ANSI NaN compare dropped)
    import spark.implicits._
    val docs = graft.Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    val withShingles = docs
      .withColumn("sh", graft.functions.GraftFunctions.shingleHashes(spark, $"text", 3))
      .select($"doc_id", $"sh")
    val cands = withShingles.as("a").crossJoin(withShingles.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.sh".as("sh_a"), $"b.sh".as("sh_b"))
      .withColumn("n_inter", size(array_intersect($"sh_a", $"sh_b")))
    val oldKept = cands
      .withColumn("jaccard", expr(
        "try_divide(cast(n_inter as double), size(sh_a) + size(sh_b) - n_inter)"))
      .filter($"jaccard" >= 0.8)
      .select($"doc_a", $"doc_b").collect().toSet
    val newKept = cands
      .filter($"n_inter" * 9 >= (size($"sh_a") + size($"sh_b")) * 4 &&
        size($"sh_a") + size($"sh_b") > 0)
      .select($"doc_a", $"doc_b").collect().toSet
    assert(oldKept == newKept, s"old=$oldKept new=$newKept")
  }
}
