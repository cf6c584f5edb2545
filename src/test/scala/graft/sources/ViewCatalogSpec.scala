package graft.sources

import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.{SparkSpec, Tables}

/** Persisted SQL views through the V2 ViewCatalog API: the stored
  * document follows the Iceberg view-spec shape (versions + SQL
  * representation + Iceberg-typed schema), loads re-plan the text
  * against the CURRENT table state (late binding), and the lifecycle
  * (create / replace / alter props / rename / drop / list) honors the
  * API contract. Spark 4.1 does not yet route `CREATE VIEW` SQL to V2
  * catalogs, so the surface is exercised at the API level — the same
  * calls the SQL path will make once wired. */
class ViewCatalogSpec extends SparkSpec {

  test("view document lifecycle with late-binding reads") {
    val wh = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-spec-view-${graft.Scratch.procToken}").toString
    graft.TmpOutputs.deleteRecursively(java.nio.file.Paths.get(wh))
    spark.conf.set("spark.sql.catalog.g_vw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g_vw.warehouse", wh)
    val catalog = spark.sessionState.catalogManager.catalog("g_vw")
      .asInstanceOf[GraftCatalog]
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("vw_nation_src")
    spark.sql("CREATE TABLE g_vw.db.n (n_nationkey INT, n_name STRING, n_regionkey INT)")
    spark.sql("""INSERT INTO g_vw.db.n
      SELECT n_nationkey, n_name, n_regionkey FROM vw_nation_src
      WHERE n_regionkey < 2""")
    val ident = Identifier.of(Array("db"), "small_nations")
    val sql = "SELECT n_regionkey, COUNT(*) AS n FROM g_vw.db.n " +
      "GROUP BY n_regionkey ORDER BY n_regionkey"
    catalog.createView(new ViewInfo(ident, sql, "g_vw", Array("db"),
      StructType(Seq(StructField("n_regionkey", IntegerType),
        StructField("n", LongType))),
      Array("n_regionkey", "n"), Array("n_regionkey", "n"), Array("", ""),
      java.util.Collections.emptyMap()))
    assert(catalog.viewExists(ident))
    // the stored document is the Iceberg view-spec shape
    val doc = GraftViews.parse(s"$wh/db/small_nations")
    assert(doc.sql == sql && doc.versionId == 1 &&
      doc.schema.fieldNames.toSeq == Seq("n_regionkey", "n"))
    // LATE BINDING: rows inserted after view creation appear on read
    spark.sql("""INSERT INTO g_vw.db.n
      SELECT n_nationkey, n_name, n_regionkey FROM vw_nation_src
      WHERE n_regionkey = 2""")
    val loaded = catalog.loadView(ident)
    val got = spark.sql(loaded.query())
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((0, 5L), (1, 5L), (2, 5L)), got.toString)
    // replace advances the version with new SQL
    catalog.replaceView(new ViewInfo(ident,
      "SELECT COUNT(*) AS total FROM g_vw.db.n", "g_vw", Array("db"),
      StructType(Seq(StructField("total", LongType))),
      Array("total"), Array("total"), Array(""),
      java.util.Collections.emptyMap()), false)
    assert(GraftViews.parse(s"$wh/db/small_nations").versionId == 2)
    assert(spark.sql(catalog.loadView(ident).query()).head().getLong(0) == 15L)
    // alter properties, list, rename, drop
    catalog.alterView(ident, ViewChange.setProperty("owner", "pipeline"))
    assert(catalog.loadView(ident).properties().get("owner") == "pipeline")
    assert(catalog.listViews("db").map(_.name()).toSeq == Seq("small_nations"))
    val renamed = Identifier.of(Array("db"), "nation_total")
    catalog.renameView(ident, renamed)
    assert(!catalog.viewExists(ident) && catalog.viewExists(renamed))
    assert(spark.sql(catalog.loadView(renamed).query()).head().getLong(0) == 15L)
    assert(catalog.dropView(renamed) && !catalog.viewExists(renamed))
    // a view can never take a TABLE's name
    val clash = Identifier.of(Array("db"), "n")
    intercept[Exception](catalog.createView(new ViewInfo(clash, "SELECT 1",
      "g_vw", Array("db"), StructType(Seq(StructField("one", IntegerType))),
      Array("one"), Array("one"), Array(""), java.util.Collections.emptyMap())))
    // tables don't list as views; views don't satisfy tableExists
    assert(catalog.listViews("db").isEmpty)
  }

  test("TRIPWIRE: Spark still refuses CREATE VIEW SQL against a V2 catalog " +
      "— when this fails, wire the SQL path to the ViewCatalog") {
    // Re-verified at Spark 4.1.2 (round 20): ResolveSessionCatalog throws
    // MISSING_CATALOG_ABILITY for CREATE VIEW on any non-session catalog,
    // so the engine's ViewCatalog surface stays programmatic-only (the
    // lifecycle test above). The moment a Spark upgrade routes the SQL,
    // this test fails and the fix is to DELETE it and spec the SQL route.
    val wh = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-spec-viewsql-${graft.Scratch.procToken}").toString
    graft.TmpOutputs.deleteRecursively(java.nio.file.Paths.get(wh))
    spark.conf.set("spark.sql.catalog.g_vwsql", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g_vwsql.warehouse", wh)
    spark.sql("CREATE TABLE g_vwsql.db.t (k INT)")
    val e = intercept[Exception](spark.sql(
      "CREATE VIEW g_vwsql.db.v AS SELECT k FROM g_vwsql.db.t"))
    assert(e.getMessage.contains("MISSING_CATALOG_ABILITY") ||
      e.getMessage.contains("does not support views") ||
      e.getMessage.contains("Catalog g_vwsql does not support"),
      s"unexpected failure shape — did Spark wire CREATE VIEW to V2? ${e.getMessage}")
  }
}
