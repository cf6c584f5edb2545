package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Position-delete semantics the i13/i14 entries cannot demonstrate on
  * the single-file testdata tables: the delete key is the FULL
  * (file_path, row position) pair, so position 0 of one file must not
  * delete position 0 of another. Two physical files with overlapping row
  * indexes pin it. */
class LakehouseSpec extends SparkSpec {

  test("position deletes key on (file, pos): same pos in another file survives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-posdel").toString
    // two single-row-group files with identical row_index ranges 0..4
    (0 until 5).map(i => (i, s"a$i")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$dir/fa")
    (10 until 15).map(i => (i, s"b$i")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$dir/fb")

    val data = spark.read.parquet(s"$dir/fa", s"$dir/fb")
      .select(col("*"),
        col("_metadata.file_path").as("_file"),
        col("_metadata.row_index").as("_pos"))

    // delete positions 0 and 2 of file A ONLY
    val fileA = data.filter(col("v").startsWith("a"))
      .select(col("_file")).distinct().head.getString(0)
    val deletes = Seq((fileA, 0L), (fileA, 2L)).toDF("file_path", "pos")

    val live = Lakehouse.applyPositionDeletes(data, deletes)
      .select(col("v")).as[String].collect().toSet

    val deletedA = data.filter(col("_file") === fileA && col("_pos").isin(0L, 2L))
      .select(col("v")).as[String].collect().toSet
    assert(deletedA.size == 2 && deletedA.forall(_.startsWith("a")))
    assert(live == Set("a1", "a3", "a4", "b10", "b11", "b12", "b13", "b14"),
      s"live=$live deletedA=$deletedA")
    // file B's positions 0 and 2 must SURVIVE (the file component matters)
    assert(live.contains("b10") && live.contains("b12"))
  }

  test("equality deletes match null equality-field values (Iceberg null-equals-null)") {
    import spark.implicits._
    val data = Seq((Some(1), "keep1"), (None, "nullkeyed"), (Some(2), "dropped"))
      .toDF("k", "v")
    // a delete-file row carrying NULL must delete the null-keyed data row
    val deletes = Seq(Option.empty[Int], Some(2)).toDF("k")
    val live = Lakehouse.applyEqualityDeletes(data, deletes)
      .select(col("v")).as[String].collect().toSet
    assert(live == Set("keep1"), s"null-safe equality must drop 'nullkeyed': $live")
  }
}
