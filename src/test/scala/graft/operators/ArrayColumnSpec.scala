package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.iceberg._

/** `array<float>` (and arrays generally) through the full table stack:
  * catalog type mapping, canonical-JSON list metadata, 3-level parquet
  * list encode/decode on BOTH scan routes (vectorized columnar; Group-API
  * row route when metadata columns or pending deletes force it), and DML
  * over tables carrying an array column. The embedding-in-the-lakehouse
  * contract (i60) rests on exactly these paths. */
class ArrayColumnSpec extends SparkSpec {

  private def mkEmbTable(catalog: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-$catalog").toString
    spark.conf.set(s"spark.sql.catalog.$catalog",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catalog.warehouse", wh)
    spark.sql(s"""CREATE TABLE $catalog.db.emb
      (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)""")
    spark.sql(s"""INSERT INTO $catalog.db.emb VALUES
      (1, array(CAST(1.5 AS FLOAT), CAST(-2.25 AS FLOAT)), 10),
      (2, array(CAST(0.5 AS FLOAT), CAST(4.75 AS FLOAT), CAST(8.125 AS FLOAT)), 20),
      (3, NULL, 30),
      (4, array(CAST(7.0 AS FLOAT)), 40)""")
    wh
  }

  test("array<float> round-trips through SQL CREATE/INSERT/SELECT (columnar route)") {
    mkEmbTable("arr_a")
    val rows = spark.sql(
      "SELECT vec_id, embedding, label FROM arr_a.db.emb ORDER BY vec_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows(0).getSeq[Float](1) == Seq(1.5f, -2.25f))
    assert(rows(1).getSeq[Float](1) == Seq(0.5f, 4.75f, 8.125f))
    assert(rows(2).isNullAt(1))
    assert(rows(3).getSeq[Float](1) == Seq(7.0f))
    assert(rows.map(_.getInt(2)).toSeq == Seq(10, 20, 30, 40))
    // scalar bounds still derive (vec_id id=1) while the array column
    // carries none — pruning on vec_id must keep working
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(
      spark.conf.get("spark.sql.catalog.arr_a.warehouse") + "/db/emb"))
    val entries = ManifestListReader.read(meta.currentSnapshot.get.manifestList.get)
      .flatMap(i => ManifestWriter.read(i.path)).filter(_.content == 0)
    assert(entries.forall(e => e.lowerBounds.contains(1) && !e.lowerBounds.contains(2)))
  }

  test("row route (metadata column) decodes arrays identically") {
    mkEmbTable("arr_b")
    // _file forces the Group-API row route; array decode must agree
    val rows = spark.sql("""SELECT vec_id, embedding, _file FROM arr_b.db.emb
      WHERE embedding IS NOT NULL ORDER BY vec_id""").collect()
    assert(rows.length == 3)
    assert(rows(0).getSeq[Float](1) == Seq(1.5f, -2.25f))
    assert(rows(1).getSeq[Float](1) == Seq(0.5f, 4.75f, 8.125f))
    assert(rows.forall(_.getString(2).nonEmpty))
  }

  test("DML (DELETE merge-on-read) works on tables carrying an array column") {
    mkEmbTable("arr_c")
    spark.sql("DELETE FROM arr_c.db.emb WHERE vec_id = 2")
    val rows = spark.sql(
      "SELECT vec_id, embedding FROM arr_c.db.emb ORDER BY vec_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))
    // the MOR read (pending deletes → row route) still decodes arrays
    assert(rows(0).getSeq[Float](1) == Seq(1.5f, -2.25f))
  }

  test("metadata round-trip: list type survives reparse as canonical JSON") {
    val t = IcebergTypes.fromString(
      """{"type":"list","element-id":5,"element":"float","element-required":false}""")
    assert(t == IcebergTypes.TList(5, IcebergTypes.TFloat))
    assert(IcebergTypes.fromString(t.name) == t)
    assert(t.sparkType == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = true))
  }
}
