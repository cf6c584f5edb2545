package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.iceberg._

/** The `entries` / `all_entries` inspection tables: per-manifest-entry
  * status/snapshot_id/sequence_number + decoded readable_metrics — the
  * reference's own record shape (`ManifestFileReadTool.java:144-157`)
  * served relationally, DELETED tombstones included. */
class LakehouseInspectSpec extends SparkSpec {

  test("i72 entry matches its oracle shape on sf0.001") {
    val df = LakehouseInspect.entriesTable(spark, sfDir)
    val rows = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
      r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(rows == Seq(
      (0, 1L, 0, 10L, "0", "21"),
      (1, 3L, 0, 15L, "2", "24"),
      (2, 2L, 0, 15L, "2", "24")), rows.toString)
  }

  test("all_entries carries every snapshot's view, entries only the head's") {
    val wh = entryDirFor("inspect-all")
    spark.conf.set("spark.sql.catalog.graft_ia",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ia.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("ia_nation_src")
    spark.sql("CREATE TABLE graft_ia.db.n (n_nationkey INT, n_name STRING)")
    spark.sql("""INSERT INTO graft_ia.db.n
      SELECT n_nationkey, n_name FROM ia_nation_src WHERE n_nationkey < 5""")
    spark.sql("""INSERT INTO graft_ia.db.n
      SELECT n_nationkey, n_name FROM ia_nation_src WHERE n_nationkey >= 5""")
    val ent = spark.sql(
      "SELECT snapshot_id, sequence_number, record_count FROM graft_ia.db.n.entries")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(ent == Seq((1L, 1L, 5L), (2L, 2L, 20L)), ent.toString)
    // snapshot 1 references one entry, snapshot 2 references both
    val all = spark.sql("""SELECT reference_snapshot_id, COUNT(*) AS n
      FROM graft_ia.db.n.all_entries GROUP BY reference_snapshot_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(all == Seq((1L, 1L), (2L, 2L)), all.toString)
    // readable_metrics decode to whole values
    val m = spark.sql("""SELECT readable_metrics['n_nationkey'].lower_bound,
      readable_metrics['n_nationkey'].upper_bound
      FROM graft_ia.db.n.entries ORDER BY sequence_number""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(m == Seq(("0", "4"), ("5", "24")), m.toString)
  }

  test("i74 add_files imports in place with footer stats") {
    val df = LakehouseInspect.addFilesImport(spark, sfDir)
    val want = Tables.load(spark, sfDir, "customer")
      .agg(count(lit(1)), sum(col("c_custkey"))).head()
    val got = df.head()
    assert(got.getLong(0) == want.getLong(0), got.toString)
    assert(got.getLong(1) == want.getLong(1), got.toString)
    // imported entries carry footer-derived bounds: the staged files were
    // range-partitioned on c_custkey, so a point query must prune files
    val wh = LakehouseExec.entryDir("i74", sfDir)
    val meta = TableMetadata.parseFile(
      GraftTable.latestMetadataPath(s"$wh/db/cust"))
    val entries = meta.currentSnapshot.flatMap(_.manifestList).toSeq
      .flatMap(ManifestListReader.read).filter(_.content == 0)
      .flatMap(i => ManifestWriter.read(i.path)).filter(_.content == 0)
    assert(entries.size == 4 && entries.forall(_.lowerBounds.contains(1)),
      s"expected 4 imported entries with custkey bounds, got ${entries.size}")
    // the import clears the exact-bounds stamp (footer strings may be
    // truncated by the original writer — stats-served string MAX must
    // refuse from now on)
    assert(!meta.properties.get("graft.metrics").contains("full"))
  }

  test("i75 mixed parquet+avro table scans both formats; filter and projection hold") {
    val df = LakehouseInspect.avroMixed(spark, sfDir)
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Tables.load(spark, sfDir, "nation").groupBy("n_regionkey")
      .agg(count(lit(1)), sum(col("n_nationkey"))).orderBy("n_regionkey")
      .collect().map(r => (r.getAs[Int](0), r.getAs[Long](1), r.getAs[Long](2))).toSeq
    assert(got == want, got.toString)
    // a filtered projection over the avro half answers correctly
    val one = spark.sql(
      "SELECT n_name FROM graft_avr.db.n WHERE n_nationkey = 12")
      .collect().map(_.getString(0)).toSeq
    assert(one == Tables.load(spark, sfDir, "nation")
      .filter(col("n_nationkey") === 12).collect().map(_.getAs[String]("n_name")).toSeq)
  }

  test("i76 position_deletes is a distributed scan over the delete files") {
    val df = LakehouseInspect.positionDeletes(spark, sfDir)
    val got = df.head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((3L, 2L, 1L)), got.toString)
    // a real scan (BatchScan over the delete files), not a LocalTableScan
    val raw = spark.sql("SELECT * FROM graft_pdt.db.n.position_deletes")
    assert(raw.queryExecution.executedPlan.toString.contains("BatchScan"),
      raw.queryExecution.executedPlan.toString)
    // positions address the single data file in insert order (nation is
    // key-ordered): deleted keys 2, 4, 11 sit at those row indexes
    assert(raw.select("pos").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 4L, 11L))
  }

  test("i85 deletion vectors: v2 upgrade, DV merge, rewrite conversion") {
    val df = LakehouseInspect.deletionVectors(spark, sfDir)
    val got = df.head()
    // 25 nations minus keys 0..5; sum(6..24) = 285
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((19L, 285L, 6L, 6L)), got.toString)
    // the inspection table serves the DV rows per-position with the
    // Puffin file as provenance
    val pd = spark.sql(
      "SELECT pos, delete_file_path FROM graft_dv.db.n.position_deletes")
      .collect()
    assert(pd.forall(_.getString(1).endsWith(".puffin")), pd.mkString(";"))
  }

  test("i86 zorder rewrite and i87 variant entries match their oracle shapes") {
    val z = LakehouseInspect.zorderRewrite(spark, sfDir).head()
    val zWant = Tables.load(spark, sfDir, "orders")
      .agg(count(lit(1)), sum(col("o_orderkey")).cast("long"),
        count(org.apache.spark.sql.functions.when(col("o_custkey") < 100, 1)),
        count(org.apache.spark.sql.functions.when(col("o_orderkey") < 100, 1))).head()
    assert(z == zWant, s"$z vs $zWant")
    val v = LakehouseInspect.variantColumns(spark, sfDir).head()
    val nat = Tables.load(spark, sfDir, "nation").filter(col("n_regionkey") =!= 2)
    val vWant = nat.agg(count(lit(1)), sum(col("n_nationkey")).cast("long"),
      max(col("n_name")), countDistinct(col("n_regionkey"))).head()
    assert(v == vWant, s"$v vs $vWant")
  }

  test("i89 partition stats entry matches its oracle shape") {
    val rows = LakehouseInspect.partitionStats(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = Tables.load(spark, sfDir, "nation")
      .groupBy(col("n_regionkey")).count().collect()
      .map(r => (s"{n_regionkey_id=${r.get(0)}}", r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(rows == want, s"$rows vs $want")
  }

  test("i90 ref retention entry matches its oracle shape") {
    val got = LakehouseInspect.refRetention(spark, sfDir).head()
    val n = Tables.load(spark, sfDir, "nation").count()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((n, 2L, 3L)),
      got.toString)
  }

  test("i77 ref lifecycle: tags pin expiry, drop_tag releases, type guards hold") {
    val df = LakehouseInspect.refLifecycle(spark, sfDir)
    val got = df.head()
    val want = Tables.load(spark, sfDir, "nation")
      .agg(count(lit(1)), sum(col("n_nationkey"))).head()
    assert(got.getLong(0) == want.getLong(0) && got.getLong(1) == want.getLong(1))
    val wh = LakehouseExec.entryDir("i77", sfDir)
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/n"))
    assert(meta.refs.map(_.name) == Seq("main") &&
      meta.snapshots.map(_.snapshotId) == Seq(2L),
      s"refs=${meta.refs} snaps=${meta.snapshots.map(_.snapshotId)}")
  }

  test("i78 three-format table (parquet+avro+orc) reads in one scan; ORC imports with bounds") {
    val df = LakehouseInspect.orcMixed(spark, sfDir)
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Tables.load(spark, sfDir, "nation").groupBy("n_regionkey")
      .agg(count(lit(1)), sum(col("n_nationkey"))).orderBy("n_regionkey")
      .collect().map(r => (r.getAs[Int](0), r.getAs[Long](1), r.getAs[Long](2))).toSeq
    assert(got == want, got.toString)
    // point query over the ORC half
    val one = spark.sql("SELECT n_name FROM graft_orc.db.n WHERE n_nationkey = 23")
      .collect().map(_.getString(0)).toSeq
    assert(one == Tables.load(spark, sfDir, "nation")
      .filter(col("n_nationkey") === 23).collect().map(_.getAs[String]("n_name")).toSeq)
  }

  test("i79 zero-copy fork: independent lineages, no bytes moved, gc guard holds") {
    val df = LakehouseInspect.snapshotFork(spark, sfDir)
    val nation = Tables.load(spark, sfDir, "nation")
    val base = nation.agg(count(lit(1)), sum(col("n_nationkey"))).head()
    val r0 = nation.filter(col("n_regionkey") === 0)
      .agg(sum(col("n_nationkey") + 100)).head().getLong(0)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("fork", base.getLong(0) + 5, base.getLong(1) + r0),
      ("src", base.getLong(0) - 1, base.getLong(1) - 3)), got.toString)
    // zero-copy: the fork's data dir holds ONLY its own post-fork file
    val wh = LakehouseExec.entryDir("i79", sfDir)
    val forkData = new java.io.File(s"$wh/db/fork/data")
    val own = Option(forkData.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    assert(own == 1, s"fork data dir should hold exactly its own insert, got $own")
    // the fork inherits the source's bound-exactness claim: an
    // engine-written source was stamped full, so the fork is too —
    // while a fork of an IMPORTED source must NOT resurrect the stamp
    val forkMeta = TableMetadata.parseFile(
      GraftTable.latestMetadataPath(s"$wh/db/fork"))
    assert(forkMeta.properties.get("graft.metrics").contains("full"))
    // a fork of an UNSTAMPED source must not resurrect the stamp
    import spark.implicits._
    val src2 = s"$wh/db/src2"
    graft.TmpOutputs.deleteRecursively(java.nio.file.Paths.get(src2))
    graft.TmpOutputs.deleteRecursively(java.nio.file.Paths.get(s"$wh/db/fork2"))
    GraftTable.create(src2, IcebergSchema(0, Seq(
      IcebergField(1, "k", required = false, "int"))),
      tableUuid = "e9e9a6a1-0000-4000-8000-0000000000f2", timestampMs = 1700000000000L)
    GraftTable.append(spark, src2, Seq(1, 2, 3).toDF("k"))
    GraftTable.removeProperties(src2, Seq("graft.metrics"))
    GraftTable.snapshotTable(src2, s"$wh/db/fork2")
    val fork2 = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/fork2"))
    assert(!fork2.properties.get("graft.metrics").contains("full"),
      s"a fork of an unstamped source must stay unstamped: ${fork2.properties}")
  }

  test("i80 migrate converts a plain directory in place; post-migrate DML works") {
    val df = LakehouseInspect.migrateDir(spark, sfDir)
    val nation = Tables.load(spark, sfDir, "nation")
    val base = nation.agg(count(lit(1)), sum(col("n_nationkey"))).head()
    val extra = nation.filter(col("n_regionkey") === 1)
      .agg(sum(col("n_nationkey") + 100)).head().getLong(0)
    val got = df.head()
    assert(got.getLong(0) == base.getLong(0) + 5 &&
      got.getLong(1) == base.getLong(1) + extra, got.toString)
    // the adopted files were not moved: still at the directory top level
    val wh = LakehouseExec.entryDir("i80", sfDir)
    val top = new java.io.File(s"$wh/db/raw").listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(top == 2, s"expected the 2 adopted files in place, got $top")
  }

  private def entryDirFor(tag: String): String = {
    val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-spec-$tag-${graft.Scratch.procToken}").toString
    graft.TmpOutputs.deleteRecursively(java.nio.file.Paths.get(d))
    d
  }
}
