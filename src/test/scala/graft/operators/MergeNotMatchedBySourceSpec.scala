package graft.operators

import graft.SparkSpec

/** Spark 4's `WHEN NOT MATCHED BY SOURCE` merge clauses through the
  * catalog's row-level machinery — the full three-way MERGE (sync a
  * table to a source: update matched, insert new, delete/flag vanished)
  * on both copy-on-write and merge-on-read tables. */
class MergeNotMatchedBySourceSpec extends SparkSpec {

  private def run(catalog: String, props: String): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-nmbs").toString
    spark.conf.set(s"spark.sql.catalog.$catalog",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catalog.warehouse", wh)
    spark.sql(s"CREATE TABLE $catalog.db.t (k INT, v STRING)$props")
    spark.sql(s"INSERT INTO $catalog.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("SELECT * FROM VALUES (2, 'B'), (4, 'D') AS s(k, v)")
      .createOrReplaceTempView(s"${catalog}_src")
    spark.sql(s"""MERGE INTO $catalog.db.t t USING ${catalog}_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val got = spark.table(s"$catalog.db.t")
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((2, "B"), (4, "D")),
      s"three-way merge result wrong: $got")
  }

  test("NOT MATCHED BY SOURCE deletes vanished rows (copy-on-write)") {
    run("graft_nmbs_cow", "")
  }

  test("NOT MATCHED BY SOURCE deletes vanished rows (merge-on-read)") {
    run("graft_nmbs_mor",
      " TBLPROPERTIES ('write.merge.mode'='merge-on-read')")
  }
}
