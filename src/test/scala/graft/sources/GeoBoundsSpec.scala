package graft.sources

import graft.SparkSpec
import graft.iceberg._
import graft.iceberg.IcebergTypes.{TGeography, TGeometry}

/** The v3 spec's geometry/geography bounds: a data file's lower bound is
  * the bounding-box corner (min x, min y) and its upper bound
  * (max x, max y), each serialized as a WKB point — NOT a byte-ordered
  * single value (binary min/max over WKB would be garbage). The task
  * writers fold the box inline per file; one non-point, unparsable, or
  * NaN-coordinate value poisons the COLUMN for that file (a bbox from
  * only the values we understood would claim coverage it cannot prove),
  * while other files' bounds stay independent. */
class GeoBoundsSpec extends SparkSpec {

  private def liveEntries(dir: String): Seq[ManifestWriter.EntryData] = {
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val snap = meta.snapshots
      .find(s => meta.currentSnapshotId.contains(s.snapshotId)).get
    snap.manifestList.toSeq.flatMap(ManifestListReader.read)
      .filter(_.content == 0)
      .flatMap(i => ManifestWriter.read(i.path)).filter(_.status != 2)
  }

  test("point files carry bounding-box WKB bounds; garbage poisons per file") {
    val wh = java.nio.file.Files.createTempDirectory("graft-geob").toString
    spark.conf.set("spark.sql.catalog.ggeo",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ggeo.warehouse", wh)
    graft.functions.GraftFunctions.register(spark)
    GraftTable.create(s"$wh/db/t", IcebergSchema(0, Seq(
      IcebergField(1, "id", required = false, fieldType = "long"),
      IcebergField(2, "geom", required = false, fieldType = "geometry"),
      IcebergField(3, "geog", required = false,
        fieldType = "geography(OGC:CRS84)"))),
      tableUuid = "u-geo", timestampMs = 1700000000000L, formatVersion = 3)

    // file 1: three points in ONE file (COALESCE(1) — a bare VALUES
    // insert fans out one row per task) → a real bounding box on both
    // geo columns
    spark.sql("""INSERT INTO ggeo.db.t
      SELECT /*+ COALESCE(1) */ * FROM VALUES
      (1L, graft_st_point(-10.5D, 4.25D), graft_st_point(30.0D, -60.5D)),
      (2L, graft_st_point(3.0D, -7.75D),  graft_st_point(31.25D, -59.0D)),
      (3L, graft_st_point(0.25D, 0.5D),   graft_st_point(29.5D, -61.25D))""")
    // file 2: a WKB LINESTRING (geometry type 2) → geom poisoned there
    spark.sql("""INSERT INTO ggeo.db.t VALUES
      (4, X'010200000001000000000000000000F03F000000000000F03F',
          graft_st_point(1.0D, 2.0D))""")
    // file 3: a NaN coordinate → poisoned (no bbox can claim NaN)
    spark.sql("""INSERT INTO ggeo.db.t VALUES
      (5, graft_st_point(CAST('NaN' AS DOUBLE), 1.0D), NULL)""")

    val entries = liveEntries(s"$wh/db/t")
    assert(entries.size == 3, entries.map(_.filePath).toString)
    def byMinId(id: Long): ManifestWriter.EntryData = entries.find(e =>
      SingleValueCodec.decode(IcebergTypes.TLong, e.lowerBounds(1)) == id).get

    val good = byMinId(1L)
    assert(SingleValueCodec.decode(TGeometry(None), good.lowerBounds(2)) ==
      GeoPoint(-10.5, -7.75))
    assert(SingleValueCodec.decode(TGeometry(None), good.upperBounds(2)) ==
      GeoPoint(3.0, 4.25))
    assert(SingleValueCodec.decode(TGeography(None, None), good.lowerBounds(3)) ==
      GeoPoint(29.5, -61.25))
    assert(SingleValueCodec.decode(TGeography(None, None), good.upperBounds(3)) ==
      GeoPoint(31.25, -59.0))
    // the bound bytes are real spec-shaped WKB points (21 bytes, LE)
    assert(good.lowerBounds(2).length == 21 && good.lowerBounds(2)(0) == 1)
    // id bounds unaffected by the geo tracking
    assert(SingleValueCodec.decode(IcebergTypes.TLong, good.upperBounds(1)) == 3L)

    val lineString = byMinId(4L)
    assert(!lineString.lowerBounds.contains(2) && !lineString.upperBounds.contains(2),
      "a non-point WKB must poison the file's geometry bounds")
    // the geography point in the same file still has its box
    assert(SingleValueCodec.decode(TGeography(None, None),
      lineString.lowerBounds(3)) == GeoPoint(1.0, 2.0))

    val nan = byMinId(5L)
    assert(!nan.lowerBounds.contains(2) && !nan.upperBounds.contains(2),
      "a NaN coordinate must poison the file's geometry bounds")
    assert(!nan.lowerBounds.contains(3),
      "an all-NULL geography column tracks no bounds")

    // the whole table still reads back (bounds never affect row content)
    assert(spark.sql("SELECT COUNT(*) FROM ggeo.db.t").head().getLong(0) == 5L)
    // and the non-point predicate path never consults the geo bounds:
    // a scan filtered on id prunes by id bounds alone
    assert(spark.sql("SELECT COUNT(*) FROM ggeo.db.t WHERE id <= 3")
      .head().getLong(0) == 3L)
  }
}
