package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.iceberg.{GraftTable, ManifestListWriter, ManifestWriter,
  MetadataWriter, ParquetFiles, Snapshot}

/** Sequence-number-scoped delete applicability (Iceberg v2 rule):
  * position deletes apply to data files with seq <= delete seq, equality
  * deletes only to STRICTLY lower seq. Covers the manifest_entry field-3
  * round-trip and the i36 end-to-end entry. */
class SequenceScopeSpec extends SparkSpec {

  test("sequence_number round-trips through manifest write/read (and None stays None)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seq").toString
    val m = s"$dir/m.avro"
    val f = s"$dir/dummy.parquet"
    spark.range(1).write.mode("overwrite").parquet(f)
    ManifestWriter.write(m, Seq(
      ManifestWriter.EntryData(1, 7L, f, 1L, 10L, Map.empty, Map.empty,
        content = 2, sequenceNumber = Some(42L)),
      ManifestWriter.EntryData(1, 7L, f, 1L, 10L, Map.empty, Map.empty)))
    val back = ManifestWriter.read(m)
    assert(back.map(_.sequenceNumber) == Seq(Some(42L), None))
  }

  test("equality deletes scope to strictly lower data sequence numbers") {
    import spark.implicits._
    val data = Seq(("a", 1L), ("b", 1L), ("a", 2L), ("a", 3L))
      .toDF("k", "_seq")
      .select($"k", lit("f").as("_file"), monotonically_increasing_id().as("_pos"), $"_seq")
    // delete of k='a' committed at seq 2: kills seq-1 'a' only — the
    // same-commit (seq 2) and later (seq 3) rows survive
    val deletes = Seq(("a", 2L)).toDF("k", "_del_seq")
    val live = Lakehouse.applyEqualityDeletesScoped(data, deletes)
      .select($"k", $"_seq").orderBy($"_seq").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(live.toSeq == Seq(("b", 1L), ("a", 2L), ("a", 3L)))
  }

  test("position deletes scope to lower-or-equal data sequence numbers") {
    import spark.implicits._
    val data = Seq(("f1", 0L, 1L), ("f1", 1L, 1L), ("f2", 0L, 3L))
      .toDF("_file", "_pos", "_seq").withColumn("payload", lit("x"))
    // delete at seq 2 names (f1,0) and (f2,0): (f1,0) dies (1 <= 2),
    // (f2,0) survives (3 > 2) even though the address matches
    val deletes = Seq(("f1", 0L, 2L), ("f2", 0L, 2L))
      .toDF("file_path", "pos", "_del_seq")
    val live = Lakehouse.applyPositionDeletesScoped(data, deletes)
      .select($"_file", $"_pos").orderBy($"_file", $"_pos").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(live.toSeq == Seq(("f1", 1L), ("f2", 0L)))
  }

  test("entry-level null sequence number inherits the list's field 515") {
    // A foreign v2 writer leaves ADDED entries' sequence_number null and
    // lets the manifest-list carry the commit's number (field 515). The
    // data file here sits at INHERITED seq 2; an equality delete at seq 2
    // must NOT apply (strict rule: 2 < 2 fails). Under the old
    // getOrElse(0) fallback the row read as seq 0 and was wrongly deleted.
    val dir = java.nio.file.Files.createTempDirectory("graft-inherit").toString
    val one = graft.Tables.load(spark, sfDir, "nation")
      .filter(col("n_nationkey") === 3)
    val f = s"$dir/data/d.parquet"
    ParquetFiles.writeOne(one, f)
    val mData = s"$dir/m-data.avro"
    ManifestWriter.write(mData, Seq(ManifestWriter.EntryData(
      1, 2L, f, 1L, ParquetFiles.length(f), Map.empty, Map.empty,
      content = 0, sequenceNumber = None))) // null → must inherit 2
    val eqF = s"$dir/data/eq.parquet"
    ParquetFiles.writeOne(one.select(col("n_name")), eqF)
    val mEq = s"$dir/m-eq.avro"
    ManifestWriter.write(mEq, Seq(ManifestWriter.EntryData(
      1, 2L, eqF, 1L, ParquetFiles.length(eqF), Map.empty, Map.empty,
      content = 2, sequenceNumber = Some(2L))))
    val list = s"$dir/snap-2-list.avro"
    ManifestListWriter.write(list, Seq(mData, mEq), 2L,
      contents = Map(mEq -> 1), seqNums = Map(mData -> 2L, mEq -> 2L))
    val snap = Snapshot(2L, None, 1700000001000L, Some("append"),
      Map.empty, Some(list), Some(0))
    val v1 = s"$dir/v1.metadata.json"
    MetadataWriter.write(v1,
      MetadataWriter.commitSnapshot(LakehouseExec.baseMetadata(dir), snap, None))
    val rows = GraftTable.read(spark, v1).collect()
    assert(rows.length == 1 && rows.head.getAs[Int]("n_nationkey") == 3)
  }

  test("i36: a row appended after an equality-delete commit escapes the delete") {
    val row = LakehouseMaint.seqScopedScan(spark, sfDir).head()
    assert(row.getAs[Int]("n_snapshots") == 3)
    assert(row.getAs[Long]("n_live") == 24L)          // 25 - nation 2
    assert(row.getAs[Long]("n_deleted_key_present") == 0L)
    assert(row.getAs[Long]("n_late_key_present") == 1L) // nation 20 survives
  }
}
