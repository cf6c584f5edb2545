package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d13's thresholded levenshtein (r21): `levenshtein(a, b, thr)` must
  * return the EXACT distance whenever dist <= thr and -1 otherwise, so
  * `dist*10 <= max_len` and `levenshtein(a, b, max_len DIV 10) >= 0` keep
  * the same rows with the same edit_dist values — the banded O(thr·L)
  * algorithm replacing the O(L²) full matrix must be invisible to the
  * oracle. */
class EditDistanceBoundSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("graft-d13-bound-spec", cores = "2")

  test("3-arg levenshtein: exact at the threshold, -1 above, column threshold works") {
    import spark.implicits._
    val df = Seq(
      ("abcdefghij", "abcdefghij", 1), // dist 0
      ("abcdefghij", "abcdefghiX", 1), // dist 1 == thr → exact
      ("abcdefghij", "abcdefgXYZ", 2), // dist 3 > thr → -1
      ("kitten", "sitting", 3),        // dist 3 == thr → exact
      ("kitten", "sitting", 2)         // dist 3 > thr → -1
    ).toDF("a", "b", "thr")
    val got = df.select(expr("levenshtein(a, b, thr)")).as[Int].collect().toSeq
    assert(got == Seq(0, 1, -1, 3, -1))
  }

  test("d13 on real testdata == the unthresholded formulation") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val newRows = SparkEntry.queries("d13_edit_distance")(spark, dir).collect().toSeq
    // reference: the pre-r21 full-matrix formulation over the same
    // candidate pairs (bands → distinct pairs → length prefilter →
    // 2-arg levenshtein → ratio filter)
    val docs = graft.Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    val bands = docs
      .select($"doc_id", posexplode(
        graft.functions.GraftFunctions.chargramBands(spark, $"text", 8, 64, 16)))
      .toDF("doc_id", "band_idx", "band_key")
    val candidates = bands.as("a")
      .join(bands.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    val refRows = candidates
      .join(docs.select($"doc_id".as("doc_a"), $"text".as("t_a")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"text".as("t_b")), "doc_b")
      .withColumn("max_len", greatest(length($"t_a"), length($"t_b")))
      .withColumn("edit_dist", levenshtein($"t_a", $"t_b"))
      .filter($"edit_dist" * 10 <= $"max_len")
      .select($"doc_a", $"doc_b", $"edit_dist", $"max_len")
      .orderBy($"doc_a", $"doc_b").collect().toSeq
    assert(newRows == refRows)
    assert(newRows.nonEmpty) // the equality must not be vacuous
  }
}
