package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's failure-reporting contract: a failed entry surfaces as
  * JSON null (never a normal-looking time) and is excluded from the total,
  * so the driver's BENCH_r{N}.json makes failures visible. */
class BenchSpec extends AnyFunSuite {

  test("failed entry renders as null and is excluded from the total") {
    val line = Bench.renderLine(
      Seq("q01_agg" -> Some(1.25), "st09_foreach_batch_sink" -> None,
        "d03_minhash_dedup" -> Some(0.5)),
      "/root/testdata/sf0.1")
    assert(line.contains("\"st09\":null"))
    assert(line.contains("\"q01\":1.25"))
    assert(line.contains("\"d03\":0.50"))
    assert(line.contains("\"value\":1.75")) // 1.25 + 0.5, null excluded
    // the line must stay parseable JSON (driver front-truncates long lines)
    assert(line.startsWith("{") && line.endsWith("}"))
  }

  test("best() takes the min of successful passes, None when all fail") {
    assert(Bench.best(Seq(Some(2.0), Some(1.0))) === Some(1.0))
    assert(Bench.best(Seq(None, Some(3.0))) === Some(3.0))
    assert(Bench.best(Seq(None, None)) === None)
  }

  test("all-entries line stays under the driver's 2000-char stdout tail") {
    // worst case: every entry takes 100+ seconds — precision degrades
    // rather than overflowing the driver's tail
    val wide = SparkEntry.queries.keys.toSeq.sorted.map(_ -> Some(123.456))
    val wideLine = Bench.renderLine(wide, "/root/testdata/sf0.1")
    assert(wideLine.length < 1900, s"bench line too long: ${wideLine.length}")
    // normal case: sub-10s entries keep the full 2-decimal resolution
    val typical = SparkEntry.queries.keys.toSeq.sorted.map(_ -> Some(1.234))
    val typicalLine = Bench.renderLine(typical, "/root/testdata/sf0.1")
    assert(typicalLine.length < 1900)
    assert(typicalLine.contains(":1.23"), "typical line must keep 2 decimals")
  }
}
