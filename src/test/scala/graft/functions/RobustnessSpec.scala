package graft.functions

import graft.SparkSpec
import graft.iceberg.TableMetadata

/** Edge-input robustness: nulls, empties, and metadata-format variants the
  * testdata never exercises. */
class RobustnessSpec extends SparkSpec {

  test("text kernels tolerate null/empty/whitespace input through SQL") {
    import spark.implicits._
    val df = Seq(Some(""), Some("   "), Some("one"), None)
      .toDF("text")
      .selectExpr(
        "graft_fingerprint64(text) AS fp",
        "graft_simhash64(text, 3) AS sh",
        "graft_minhash_sig(text, 3, 16) AS sig",
        "graft_lang_id(text) AS lang",
        "graft_shingle_hashes(text, 3) AS shingles")
    val rows = df.collect()
    assert(rows.length == 4)
    // null input → null output (null-intolerant expressions)
    assert(rows(3).isNullAt(0) && rows(3).isNullAt(1) && rows(3).isNullAt(3))
    // empty/whitespace input → defined, deterministic output
    assert(!rows(0).isNullAt(0))
    assert(rows(0).getAs[String]("lang") == "und")
    assert(rows(1).getAs[scala.collection.Seq[Long]]("shingles").isEmpty)
  }

  test("kernel edge cases: short docs, single token, unicode") {
    assert(TextAlgos.shingleHashes("one two", 3).length == 1) // shorter than k
    assert(TextAlgos.tokenize("").isEmpty)
    assert(TextAlgos.minHashSignature("", 3, 8).forall(_ == Long.MaxValue))
    assert(TextAlgos.simHash64("", 3) == 0L)
    assert(TextAlgos.fingerprint64("héllo wörld") == TextAlgos.fingerprint64(" héllo  wörld "))
    assert(TextAlgos.charGramHashes("abc", 8).isEmpty)
    // positional shingles: n-k+1 hashes in document order, non-distinct,
    // each equal to the hash of the joined window
    val pos = TextAlgos.posShingleHashes("a b c a b c", 2)
    assert(pos.length == 5)
    assert(pos(0) == TextAlgos.fnv1a64("a b") && pos(0) == pos(3)) // repeats kept
    assert(pos.toSet == TextAlgos.shingleHashes("a b c a b c", 2).toSet)
    assert(TextAlgos.posShingleHashes("a b", 3).isEmpty) // shorter than k
  }

  test("normalize_text equals the regex formulation on edge strings and real documents") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val edge = Seq("", "   ", "a", "  Hello,   World!! 42 ", "a!b", "a ! b",
      "tabs\tand\nnewlines", "MiXeD CaSe-42", "!!!", "a  b   c")
    val docs = graft.Tables.load(spark, sfDir, "documents").select($"text")
      .union(edge.toDF("text"))
    val regexNorm = trim(regexp_replace(regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " "))
    val mismatches = docs
      .select(GraftFunctions.normalizeText(spark, $"text").as("fast"), regexNorm.as("slow"))
      .filter(not($"fast" <=> $"slow"))
      .count()
    assert(mismatches == 0)
  }

  test("v2 metadata document parses (sequence numbers, parent snapshots, no top-level schema)") {
    val v2 =
      """{
        |  "format-version": 2,
        |  "table-uuid": "u",
        |  "location": "file:/tmp/t",
        |  "last-sequence-number": 3,
        |  "last-updated-ms": 1700000000000,
        |  "current-schema-id": 1,
        |  "schemas": [
        |    {"type": "struct", "schema-id": 0, "fields": [
        |      {"id": 1, "name": "a", "required": true, "type": "int"}]},
        |    {"type": "struct", "schema-id": 1, "fields": [
        |      {"id": 1, "name": "a", "required": true, "type": "long"},
        |      {"id": 2, "name": "b", "required": false, "type": "decimal(9, 2)"},
        |      {"id": 3, "name": "c", "required": false, "type": {"type": "list", "element": "string"}}]}
        |  ],
        |  "partition-specs": [{"spec-id": 0, "fields": []}],
        |  "sort-orders": [{"order-id": 0, "fields": []}],
        |  "current-snapshot-id": 2,
        |  "snapshots": [
        |    {"snapshot-id": 1, "timestamp-ms": 1699990000000,
        |     "summary": {"operation": "append"}, "manifest-list": "ml1"},
        |    {"snapshot-id": 2, "parent-snapshot-id": 1, "timestamp-ms": 1700000000000,
        |     "summary": {"operation": "overwrite"}, "manifest-list": "ml2"}],
        |  "snapshot-log": [
        |    {"timestamp-ms": 1699990000000, "snapshot-id": 1},
        |    {"timestamp-ms": 1700000000000, "snapshot-id": 2}]
        |}""".stripMargin
    val m = TableMetadata.parse(v2)
    assert(m.formatVersion == 2)
    // schema-evolution: current schema is id 1 (a promoted int→long)
    assert(m.fieldTypes(1) == "long")
    assert(m.fieldTypes(2) == "decimal(9, 2)")
    // nested type kept as canonical JSON, skippable by the type parser
    assert(graft.iceberg.IcebergTypes.fromStringOpt(m.fieldTypes(3)).isEmpty)
    assert(m.currentSnapshot.map(_.operation) == Some(Some("overwrite")))
    assert(m.snapshots(1).parentSnapshotId.contains(1L))
    // time travel: as-of between the two commits resolves to snapshot 1
    assert(m.snapshotAsOf(1699995000000L).map(_.snapshotId).contains(1L))
    assert(m.snapshotAsOf(1700000000001L).map(_.snapshotId).contains(2L))
    assert(m.snapshotAsOf(0L).isEmpty)
  }

  test("decode_bounds: dropped column ids render as type:unknown, null maps pass through") {
    import spark.implicits._
    val df = Seq(
      (1, Map(1 -> Array[Byte](1, 0, 0, 0, 0, 0, 0, 0), 99 -> Array[Byte](0x7f))),
      (2, null.asInstanceOf[Map[Int, Array[Byte]]]))
      .toDF("id", "bounds")
    val out = BoundDecode.decodeBounds(spark, $"bounds", Map(1 -> "long"))
    val rows = df.select($"id", out.as("dec")).orderBy($"id").collect()
    val m = rows(0).getAs[Map[Int, String]]("dec")
    assert(m(1) == "value:1;type:long")
    assert(m(99) == "value:7f;type:unknown")
    assert(rows(1).isNullAt(1))
  }
}
