package graft.operators

import graft.SparkSpec

/** t17 semantics on a planted fixture: exactly-13-token overlap flags, a
  * 12-token overlap does not (the n-gram boundary is sharp), short
  * documents are out of scope on both sides, and repeated occurrences of
  * one benchmark gram count positions and distinct grams separately. */
class DecontaminationSpec extends SparkSpec {

  private def benchTok(i: Int) = s"b$i"

  test("13-gram overlap flags; 12-gram overlap and short docs do not") {
    import spark.implicits._
    val bRun = (2 to 14).map(benchTok).mkString(" ") // 13 benchmark tokens
    val docs = Seq(
      // doc 0: the benchmark split (doc_id % 5 == 0) — 20 tokens b0..b19
      (0L, (0 to 19).map(benchTok).mkString(" ")),
      // doc 1: one exact 13-gram hit inside filler (5 positions total)
      (1L, s"x0 x1 $bRun y0 y1"),
      // doc 2: only a 12-token run (b3..b14) — must NOT flag
      (2L, "q0 " + (3 to 14).map(benchTok).mkString(" ") + " q1"),
      // doc 3: too short for any 13-gram — out of scope entirely
      (3L, "s0 s1 s2 s3 s4"),
      // doc 4: the SAME benchmark gram twice (positions 0 and 14)
      (4L, s"$bRun u0 $bRun"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-decontam").toString
    docs.write.parquet(s"$dir/documents.parquet")

    val out = TextPipeline.queries("t17_decontamination")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 5L),   // 1 hit position, 1 distinct gram, 5 positions
      (4L, 2L, 1L, 15L)), // same gram twice: 2 positions, 1 distinct
      s"got ${out.toSeq}")
  }

  test("t18 removal: overlapping hits union their covered spans, never double-count") {
    import spark.implicits._
    val docs = Seq(
      // benchmark: 20 tokens b0..b19
      (0L, "bench", (0 to 19).map(benchTok).mkString(" ")),
      // two OVERLAPPING matching 13-grams (b2..b14 at pos 0, b3..b15 at
      // pos 1) over a 14-token doc: the union covers ALL 14 tokens —
      // naive per-hit accounting would claim 26
      (1L, "s", (2 to 15).map(benchTok).mkString(" ")),
      // clean doc, 13 tokens — counted in totals, zero removed
      (2L, "s", (0 until 13).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-t18").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = TextPipeline.queries("t18_contamination_removal")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("s", 2L, 1L, 27L, 14L)), s"got ${out.toSeq}")
  }
}
