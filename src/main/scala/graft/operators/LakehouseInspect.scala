package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.iceberg._
import graft.operators.LakehouseExec.entryDir

/** Round-13 lakehouse surface: the per-entry inspection views and table
  * onboarding paths an operator reaches for daily.
  *
  * - i72: the `entries` inspection table — one row per manifest_entry of
  *   the current snapshot with status/snapshot_id/sequence_number and
  *   decoded readable_metrics. This is the REFERENCE'S OWN record shape
  *   (`ManifestFileReadTool.java:144-157` emits exactly one JSON object
  *   per manifest_entry, status and sequence numbers included) served
  *   relationally. The fixture drives all three statuses through a COW
  *   UPDATE: the untouched file re-lists as EXISTING, the rewritten file
  *   lands ADDED, and the replaced file tombstones as DELETED —
  *   invisible to scans, visible here.
  */
object LakehouseInspect {

  type Q = (SparkSession, String) => DataFrame

  private val T0 = LakehouseExec.T0

  // ---------------------------------------------------------------- i72
  val entriesTable: Q = (spark, sfDir) => {
    val wh = entryDir("i72", sfDir)
    spark.conf.set("spark.sql.catalog.graft_ent",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ent.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i72_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql("""CREATE TABLE graft_ent.db.n
        (n_nationkey INT, n_name STRING, n_regionkey INT)""")
      // two appends → two data files at sequences 1 and 2
      spark.sql("""INSERT INTO graft_ent.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i72_nation_src
        WHERE n_regionkey < 2""")
      spark.sql("""INSERT INTO graft_ent.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i72_nation_src
        WHERE n_regionkey >= 2""")
      // COW UPDATE touches only the second file: its rewrite lands as
      // ADDED at sequence 3, the original tombstones as DELETED at its
      // own sequence 2, and the untouched first file re-lists EXISTING
      spark.sql("""UPDATE graft_ent.db.n
        SET n_name = concat(n_name, '_X') WHERE n_nationkey = 22""")
      // the tombstone is invisible to the scan...
      val live = spark.sql("SELECT COUNT(*) AS n FROM graft_ent.db.n").head().getLong(0)
      require(live == 25, s"expected 25 live rows after COW update, got $live")
    }
    // ...but the entries table shows the full commit anatomy
    spark.sql("""SELECT status, sequence_number, content,
      record_count,
      readable_metrics['n_nationkey'].lower_bound AS min_key,
      readable_metrics['n_nationkey'].upper_bound AS max_key
      FROM graft_ent.db.n.entries ORDER BY status""")
  }

  val entriesTableSql: String =
    """SELECT CAST(0 AS INTEGER) AS status, CAST(1 AS BIGINT) AS sequence_number,
      |  CAST(0 AS INTEGER) AS content, COUNT(*) AS record_count,
      |  CAST(MIN(n_nationkey) AS VARCHAR) AS min_key,
      |  CAST(MAX(n_nationkey) AS VARCHAR) AS max_key
      |FROM nation WHERE n_regionkey < 2
      |UNION ALL
      |SELECT CAST(1 AS INTEGER), CAST(3 AS BIGINT), CAST(0 AS INTEGER), COUNT(*),
      |  CAST(MIN(n_nationkey) AS VARCHAR), CAST(MAX(n_nationkey) AS VARCHAR)
      |FROM nation WHERE n_regionkey >= 2
      |UNION ALL
      |SELECT CAST(2 AS INTEGER), CAST(2 AS BIGINT), CAST(0 AS INTEGER), COUNT(*),
      |  CAST(MIN(n_nationkey) AS VARCHAR), CAST(MAX(n_nationkey) AS VARCHAR)
      |FROM nation WHERE n_regionkey >= 2
      |ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- i73
  /** `ALTER TABLE … RENAME COLUMN` — a metadata-only commit (the field
    * keeps its id; only the name advances), with files from BOTH name
    * generations read back correctly: the pre-rename files carry the old
    * physical column name and resolve through the field-id name history,
    * the post-rename insert lands under the new name, and the final
    * aggregate mixes both. The catalog refuses reusing another field's
    * historical name (name-resolution safety). */
  val renameColumn: Q = (spark, sfDir) => {
    val wh = entryDir("i73", sfDir)
    spark.conf.set("spark.sql.catalog.graft_ren",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ren.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i73_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql("""CREATE TABLE graft_ren.db.n
        (n_nationkey INT, n_name STRING, n_regionkey INT)""")
      spark.sql("""INSERT INTO graft_ren.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i73_nation_src""")
      spark.sql("ALTER TABLE graft_ren.db.n RENAME COLUMN n_name TO nation_name")
      // a post-rename generation: new files carry the NEW physical name
      spark.sql("""INSERT INTO graft_ren.db.n
        SELECT n_nationkey + 100, concat(n_name, '_R'), n_regionkey
        FROM i73_nation_src WHERE n_regionkey = 0""")
      // reusing a historical name for a DIFFERENT field must refuse
      val refused = scala.util.Try(spark.sql(
        "ALTER TABLE graft_ren.db.n RENAME COLUMN n_regionkey TO n_name")).isFailure
      require(refused, "renaming another field to a historical name must refuse")
    }
    spark.sql("""SELECT n_regionkey, COUNT(*) AS n,
      MAX(nation_name) AS top_name,
      CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
      FROM graft_ren.db.n GROUP BY n_regionkey ORDER BY n_regionkey""")
  }

  val renameColumnSql: String =
    """SELECT n_regionkey, COUNT(*) AS n, MAX(nation_name) AS top_name,
      |  CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
      |FROM (
      |  SELECT n_nationkey, n_name AS nation_name, n_regionkey FROM nation
      |  UNION ALL
      |  SELECT n_nationkey + 100, n_name || '_R', n_regionkey
      |  FROM nation WHERE n_regionkey = 0
      |) GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  // ---------------------------------------------------------------- i74
  /** `add_files` table import — the #1 onboarding path: an existing
    * directory of plain parquet files becomes one append snapshot with
    * the files referenced IN PLACE and stats derived from the parquet
    * FOOTERS alone (zero data bytes read; at 100 TB the import is a
    * metadata commit, not a rewrite). The fixture proves both halves:
    * the scan over the imported table hash-matches the oracle over the
    * same rows, and a bound-pruned point query works — footer min/max
    * made it into the manifests. */
  val addFilesImport: Q = (spark, sfDir) => {
    val wh = entryDir("i74", sfDir)
    spark.conf.set("spark.sql.catalog.graft_add",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_add.warehouse", wh)
    val src = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal").cast("double"))
    graft.TmpOutputs.ensure(wh) {
      // the pre-existing plain-parquet directory (4 files, so the import
      // carries several entries with distinct footer bound ranges)
      src.repartitionByRange(4, col("c_custkey"))
        .write.parquet(s"$wh/staging")
      spark.sql("""CREATE TABLE graft_add.db.cust
        (c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE)""")
      val row = spark.sql(
        s"CALL graft_add.system.add_files(table => 'db.cust', source_dir => '$wh/staging')")
        .head()
      require(row.getInt(0) == 4, s"expected 4 imported files, got $row")
    }
    spark.sql("""SELECT COUNT(*) AS n_rows,
      CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
      CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18, 2))), 2) AS DOUBLE) AS bal,
      (SELECT c_name FROM graft_add.db.cust WHERE c_custkey = 7) AS name_7
      FROM graft_add.db.cust""")
  }

  val addFilesImportSql: String =
    """SELECT COUNT(*) AS n_rows, CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18, 2))), 2) AS DOUBLE) AS bal,
      |  (SELECT c_name FROM customer WHERE c_custkey = 7) AS name_7
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- i75
  /** AVRO data files on the read path — the reference is itself an Avro
    * object-container decoder (`ManifestFileReadTool.java:140`), and a
    * foreign Iceberg table may mark entries `file_format = AVRO`. The
    * fixture builds a MIXED table: a native parquet insert plus an
    * imported Avro container (`add_files(format => 'avro')`, record
    * count from the block headers alone), and one scan reads both
    * formats through their per-format partition readers. */
  val avroMixed: Q = (spark, sfDir) => {
    val wh = entryDir("i75", sfDir)
    spark.conf.set("spark.sql.catalog.graft_avr",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_avr.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i75_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql("""CREATE TABLE graft_avr.db.n
        (n_nationkey INT, n_name STRING, n_regionkey INT)""")
      spark.sql("""INSERT INTO graft_avr.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i75_nation_src
        WHERE n_regionkey < 2""")
      // the "foreign" Avro container: region >= 2 rows
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_nationkey",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("n_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_regionkey",
          org.apache.spark.sql.types.IntegerType)))
      val rows = spark.sql("""SELECT n_nationkey, n_name, n_regionkey
        FROM i75_nation_src WHERE n_regionkey >= 2 ORDER BY n_nationkey""").collect().toSeq
      AvroDataFiles.write(s"$wh/avro_src/part-00000.avro", schema, rows)
      val imported = spark.sql(s"""CALL graft_avr.system.add_files(
        table => 'db.n', source_dir => '$wh/avro_src', format => 'avro')""").head()
      require(imported.getInt(0) == 1 && imported.getLong(1) == rows.size.toLong,
        s"expected 1 avro file with ${rows.size} block-counted records, got $imported")
    }
    spark.sql("""SELECT n_regionkey, COUNT(*) AS n,
      CAST(SUM(n_nationkey) AS BIGINT) AS sum_key, MAX(n_name) AS top_name
      FROM graft_avr.db.n GROUP BY n_regionkey ORDER BY n_regionkey""")
  }

  val avroMixedSql: String =
    """SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      |  MAX(n_name) AS top_name
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  // ---------------------------------------------------------------- i78
  /** ORC data files complete the foreign-format read path (the verdict's
    * "Avro (and ORC)"): a table whose entries span ALL THREE formats —
    * a native parquet insert, an imported Avro container, an imported
    * ORC file — reads in ONE scan through per-format partition readers.
    * The ORC import derives row counts AND column bounds from the ORC
    * footer alone (as metadata-only as parquet's), proven by a
    * bound-pruned point query after the import. */
  val orcMixed: Q = (spark, sfDir) => {
    val wh = entryDir("i78", sfDir)
    spark.conf.set("spark.sql.catalog.graft_orc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_orc.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i78_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql("""CREATE TABLE graft_orc.db.n
        (n_nationkey INT, n_name STRING, n_regionkey INT)""")
      spark.sql("""INSERT INTO graft_orc.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i78_nation_src
        WHERE n_regionkey < 2""")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_nationkey",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("n_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_regionkey",
          org.apache.spark.sql.types.IntegerType)))
      def rowsWhere(pred: String) = spark.sql(s"""SELECT n_nationkey, n_name,
        n_regionkey FROM i78_nation_src WHERE $pred ORDER BY n_nationkey""")
        .collect().toSeq
      AvroDataFiles.write(s"$wh/avro_src/part-00000.avro", schema,
        rowsWhere("n_regionkey = 2"))
      OrcDataFiles.write(s"$wh/orc_src/part-00000.orc", schema,
        rowsWhere("n_regionkey >= 3"))
      spark.sql(s"""CALL graft_orc.system.add_files(
        table => 'db.n', source_dir => '$wh/avro_src', format => 'avro')""")
      val orcRow = spark.sql(s"""CALL graft_orc.system.add_files(
        table => 'db.n', source_dir => '$wh/orc_src', format => 'orc')""").head()
      require(orcRow.getInt(0) == 1, s"expected 1 orc file imported, got $orcRow")
      // the ORC footer bounds landed in the manifest: the imported entry
      // must carry n_nationkey bounds (prunable import, like parquet)
      val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/n"))
      val orcEntries = meta.currentSnapshot.flatMap(_.manifestList).toSeq
        .flatMap(ManifestListReader.read).filter(_.content == 0)
        .flatMap(i => ManifestWriter.read(i.path))
        .filter(e => e.status != 2 && e.fileFormat == "ORC")
      require(orcEntries.nonEmpty && orcEntries.forall(_.lowerBounds.contains(1)),
        s"ORC import must carry footer-derived bounds: $orcEntries")
    }
    spark.sql("""SELECT n_regionkey, COUNT(*) AS n,
      CAST(SUM(n_nationkey) AS BIGINT) AS sum_key, MAX(n_name) AS top_name
      FROM graft_orc.db.n GROUP BY n_regionkey ORDER BY n_regionkey""")
  }

  val orcMixedSql: String =
    """SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      |  MAX(n_name) AS top_name
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  // ---------------------------------------------------------------- i79
  /** Zero-copy table fork (`snapshot` procedure): the fork references
    * the source's current data files in place — no bytes move — and the
    * two lineages are independent from the first commit: an insert into
    * the fork and a delete on the source are each invisible to the
    * other side. The fork carries `gc.enabled=false`, so its snapshot
    * expiry provably refuses (a fork reclaiming "its" files would
    * delete production data — Iceberg's guard, enforced). */
  val snapshotFork: Q = (spark, sfDir) => {
    val wh = entryDir("i79", sfDir)
    spark.conf.set("spark.sql.catalog.graft_snp",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_snp.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i79_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql("""CREATE TABLE graft_snp.db.src
        (n_nationkey INT, n_name STRING, n_regionkey INT)""")
      spark.sql("""INSERT INTO graft_snp.db.src
        SELECT n_nationkey, n_name, n_regionkey FROM i79_nation_src""")
      val row = spark.sql("""CALL graft_snp.system.snapshot(
        source_table => 'db.src', table => 'db.fork')""").head()
      require(row.getLong(1) == 25L, s"expected 25 forked records, got $row")
      // independent lineages: fork-only insert, source-only delete
      spark.sql("""INSERT INTO graft_snp.db.fork
        SELECT n_nationkey + 100, concat(n_name, '_F'), n_regionkey
        FROM i79_nation_src WHERE n_regionkey = 0""")
      spark.sql("DELETE FROM graft_snp.db.src WHERE n_nationkey = 3")
      // the gc guard: cleanup on the fork must refuse
      require(scala.util.Try(spark.sql(
        "CALL graft_snp.system.expire_snapshots(table => 'db.fork', retain_last => 1)"))
        .isFailure, "expiry on a gc.enabled=false fork must refuse")
    }
    spark.sql("""SELECT side, n, sum_key FROM (
      SELECT 'fork' AS side, COUNT(*) AS n,
        CAST(SUM(n_nationkey) AS BIGINT) AS sum_key FROM graft_snp.db.fork
      UNION ALL
      SELECT 'src' AS side, COUNT(*) AS n,
        CAST(SUM(n_nationkey) AS BIGINT) AS sum_key FROM graft_snp.db.src
    ) ORDER BY side""")
  }

  val snapshotForkSql: String =
    """SELECT side, n, sum_key FROM (
      |  SELECT 'fork' AS side, COUNT(*) + 5 AS n,
      |    CAST(SUM(n_nationkey)
      |      + (SELECT SUM(n_nationkey + 100) FROM nation WHERE n_regionkey = 0)
      |      AS BIGINT) AS sum_key
      |  FROM nation
      |  UNION ALL
      |  SELECT 'src' AS side, COUNT(*) - 1 AS n,
      |    CAST(SUM(n_nationkey) - 3 AS BIGINT) AS sum_key FROM nation
      |) t ORDER BY side""".stripMargin

  // ---------------------------------------------------------------- i80
  /** `migrate` — in-place conversion of a PLAIN parquet directory into
    * a table: schema inferred from the footers, the existing files
    * adopted as one append snapshot (footer stats, zero bytes moved or
    * read), and from that commit on the directory is a full table — the
    * post-migrate INSERT through the catalog proves it. Completes the
    * onboarding trio: add_files (adopt into an existing table),
    * snapshot (zero-copy fork), migrate (convert in place). */
  val migrateDir: Q = (spark, sfDir) => {
    val wh = entryDir("i80", sfDir)
    spark.conf.set("spark.sql.catalog.graft_mig",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mig.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i80_nation_src")
    graft.TmpOutputs.ensure(wh) {
      // the pre-existing PLAIN directory a legacy pipeline wrote
      spark.sql("""SELECT n_nationkey, n_name, n_regionkey FROM i80_nation_src""")
        .repartitionByRange(2, col("n_nationkey"))
        .write.parquet(s"$wh/db/raw")
      val row = spark.sql("CALL graft_mig.system.migrate(table => 'db.raw')").head()
      require(row.getInt(0) == 2 && row.getLong(1) == 25L,
        s"expected 2 files / 25 records migrated, got $row")
      // the directory is a real table now: catalog INSERT lands a
      // second snapshot next to the adopted files
      spark.sql("""INSERT INTO graft_mig.db.raw
        SELECT n_nationkey + 100, concat(n_name, '_M'), n_regionkey
        FROM i80_nation_src WHERE n_regionkey = 1""")
    }
    spark.sql("""SELECT COUNT(*) AS n_rows,
      CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      MAX(n_name) AS top_name
      FROM graft_mig.db.raw""")
  }

  val migrateDirSql: String =
    """SELECT COUNT(*) AS n_rows, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      |  MAX(n_name) AS top_name
      |FROM (
      |  SELECT n_nationkey, n_name FROM nation
      |  UNION ALL
      |  SELECT n_nationkey + 100, n_name || '_M' FROM nation WHERE n_regionkey = 1
      |) t""".stripMargin

  // ---------------------------------------------------------------- i76
  /** The `position_deletes` inspection table — the audit companion of
    * `rewrite_position_delete_files` (i68): one row per live deleted
    * position with its provenance delete file. Served as a REAL
    * distributed scan (per-delete-file tasks), because unlike the
    * per-file metadata tables this one is per-ROW and a delete-heavy
    * CDC table holds millions of positions. The fixture deletes rows in
    * two separate commits, then checks the table sees both delete files
    * and exactly the deleted keys' positions. */
  val positionDeletes: Q = (spark, sfDir) => {
    val wh = entryDir("i76", sfDir)
    spark.conf.set("spark.sql.catalog.graft_pdt",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_pdt.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i76_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql("""CREATE TABLE graft_pdt.db.n
        (n_nationkey INT, n_name STRING, n_regionkey INT)""")
      spark.sql("""INSERT INTO graft_pdt.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i76_nation_src""")
      spark.sql("DELETE FROM graft_pdt.db.n WHERE n_nationkey IN (2, 4)")
      spark.sql("DELETE FROM graft_pdt.db.n WHERE n_nationkey = 11")
      val live = spark.sql("SELECT COUNT(*) AS n FROM graft_pdt.db.n").head().getLong(0)
      require(live == 22, s"expected 22 live rows, got $live")
    }
    spark.sql("""SELECT COUNT(*) AS n_deleted,
      COUNT(DISTINCT delete_file_path) AS n_delete_files,
      COUNT(DISTINCT file_path) AS n_data_files
      FROM graft_pdt.db.n.position_deletes""")
  }

  val positionDeletesSql: String =
    """SELECT COUNT(*) AS n_deleted, CAST(2 AS BIGINT) AS n_delete_files,
      |  CAST(1 AS BIGINT) AS n_data_files
      |FROM nation WHERE n_nationkey IN (2, 4, 11)""".stripMargin

  // ---------------------------------------------------------------- i77
  /** Ref lifecycle end-to-end: a tag PINS its snapshot (expiry provably
    * aborts on it — the guard that time-travel anchors can't silently
    * vanish), `drop_tag` is the release valve (expiry then succeeds),
    * and the type guards hold (`drop_tag` refuses a branch). This is
    * the missing half of create_tag/create_branch — without it a table
    * with a stale tag can NEVER reclaim its history. */
  val refLifecycle: Q = (spark, sfDir) => {
    val wh = entryDir("i77", sfDir)
    spark.conf.set("spark.sql.catalog.graft_ref",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ref.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i77_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql(s"""CREATE TABLE graft_ref.db.n
        (n_nationkey INT, n_name STRING, n_regionkey INT)
        TBLPROPERTIES ('commit-timestamp-ms'='$T0')""")
      spark.sql("""INSERT INTO graft_ref.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i77_nation_src
        WHERE n_regionkey < 3""")
      spark.sql("CALL graft_ref.system.create_tag(table => 'db.n', tag => 'v1')")
      spark.sql("CALL graft_ref.system.create_branch(table => 'db.n', branch => 'wip')")
      spark.sql("""INSERT INTO graft_ref.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i77_nation_src
        WHERE n_regionkey >= 3""")
      // the tag pins snapshot 1: expiry must abort rather than break
      // the time-travel anchor
      val pinned = scala.util.Try(spark.sql(
        "CALL graft_ref.system.expire_snapshots(table => 'db.n', retain_last => 1)"))
      require(pinned.isFailure, "expiry must abort while a ref pins the snapshot")
      // type guard: drop_tag must not silently delete a branch
      require(scala.util.Try(spark.sql(
        "CALL graft_ref.system.drop_tag(table => 'db.n', tag => 'wip')")).isFailure,
        "drop_tag must refuse a branch ref")
      spark.sql("CALL graft_ref.system.drop_tag(table => 'db.n', tag => 'v1')")
      spark.sql("CALL graft_ref.system.drop_branch(table => 'db.n', branch => 'wip')")
      val row = spark.sql(
        "CALL graft_ref.system.expire_snapshots(table => 'db.n', retain_last => 1)").head()
      require(row.getInt(0) == 1 && row.getInt(1) == 1,
        s"expected (expired=1, retained=1) after dropping the refs, got $row")
    }
    spark.sql("""SELECT COUNT(*) AS n_rows,
      CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      COUNT(DISTINCT n_regionkey) AS n_regions
      FROM graft_ref.db.n""")
  }

  val refLifecycleSql: String =
    """SELECT COUNT(*) AS n_rows, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      |  COUNT(DISTINCT n_regionkey) AS n_regions
      |FROM nation""".stripMargin

  // ---------------------------------------------------------------- i82
  /** CDC changelog via `create_changelog_view`: a four-commit timeline
    * (append, append, MOR position-delete DML, equality-delete upsert)
    * plus a compaction whose `replace` snapshot must emit NOTHING. The
    * changelog view's (ordinal, op) rollup is fully recomputable from
    * the source table — every commit's content is data-defined, so the
    * oracle never depends on file layout. */
  val changelogView: Q = (spark, sfDir) => {
    val wh = entryDir("i82", sfDir)
    spark.conf.set("spark.sql.catalog.graft_cdc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cdc.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i82_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql("""CREATE TABLE graft_cdc.db.n
        (k BIGINT, name STRING, r BIGINT)""")
      spark.sql("""INSERT INTO graft_cdc.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i82_nation_src WHERE n_regionkey < 2""")
      spark.sql("""INSERT INTO graft_cdc.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i82_nation_src WHERE n_regionkey >= 2""")
      spark.sql("DELETE FROM graft_cdc.db.n WHERE r = 2")
      import spark.implicits._
      GraftTable.upsert(spark, s"$wh/db/n",
        Seq((5L, "UPSERTED", 9L), (100L, "NEW ROW", 9L)).toDF("k", "name", "r"),
        Seq("k"))
      // compaction: the replace snapshot is logically invisible — if it
      // ever leaked into the changelog the ordinal-3 rollup below would
      // double-count every surviving row and hash-mismatch the oracle
      spark.sql("CALL graft_cdc.system.rewrite_data_files(table => 'db.n')")
    }
    spark.sql("""CALL graft_cdc.system.create_changelog_view(
      table => 'db.n', changelog_view => 'i82_changes')""")
    spark.sql("""SELECT _change_ordinal AS ordinal, _change_type AS op,
        COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
      FROM i82_changes GROUP BY _change_ordinal, _change_type
      ORDER BY ordinal, op""")
  }

  val changelogViewSql: String =
    """SELECT * FROM (
      |  SELECT 0 AS ordinal, 'insert' AS op, COUNT(*) AS n,
      |    CAST(SUM(n_nationkey) AS BIGINT) AS sum_k FROM nation WHERE n_regionkey < 2
      |  UNION ALL
      |  SELECT 1, 'insert', COUNT(*), CAST(SUM(n_nationkey) AS BIGINT)
      |  FROM nation WHERE n_regionkey >= 2
      |  UNION ALL
      |  SELECT 2, 'delete', COUNT(*), CAST(SUM(n_nationkey) AS BIGINT)
      |  FROM nation WHERE n_regionkey = 2
      |  UNION ALL SELECT 3, 'delete', CAST(1 AS BIGINT), CAST(5 AS BIGINT)
      |  UNION ALL SELECT 3, 'insert', CAST(2 AS BIGINT), CAST(105 AS BIGINT))
      |ORDER BY ordinal, op""".stripMargin

  // ---------------------------------------------------------------- i83
  /** ANALYZE → CBO: `compute_table_stats` lands per-column NDV (theta
    * sketch; exact below its 4K nominal entries) +
    * exact null counts + row count as a statistics blob in the metadata
    * `statistics` list (the Puffin slot), and the DSv2 scan serves it
    * back as V2 column statistics. The entry REQUIRES the CBO loop
    * closed (attribute stats visible on the optimized scan, NDV within
    * the sketch's error bound) and emits only the exactly-recomputable
    * quantities — row count, analyzed column count, null count, and the
    * manifest-bound-derived min/max as CBO saw them. */
  val tableStatsEntry: Q = (spark, sfDir) => {
    val wh = entryDir("i83", sfDir)
    spark.conf.set("spark.sql.catalog.graft_ts",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ts.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i83_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql("CREATE TABLE graft_ts.db.n (k BIGINT, name STRING, r BIGINT)")
      spark.sql("""INSERT INTO graft_ts.db.n
        SELECT n_nationkey, CASE WHEN n_regionkey = 2 THEN NULL ELSE n_name END,
          n_regionkey FROM i83_nation_src""")
      // round 17: the full ANALYZE becomes the INCREMENTAL anchor — the
      // refresh below sketches only the second append's files and unions
      spark.sql("CALL graft_ts.system.compute_table_stats(table => 'db.n')")
      spark.sql("""INSERT INTO graft_ts.db.n
        SELECT n_nationkey + 100, n_name, n_regionkey FROM i83_nation_src
        WHERE n_nationkey < 5""")
    }
    val out = spark.sql("CALL graft_ts.system.compute_table_stats(" +
      "table => 'db.n', incremental => true)").head()
    require(out.getString(4) == "incremental",
      s"append-only chain must take the incremental path: $out")
    val dir = s"$wh/db/n"
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val doc = graft.iceberg.TableStats.read(meta.statistics
      .find(_.snapshotId == out.getLong(0)).get.path)
    val kId = meta.currentSchema.fields.find(_.name == "k").get.id
    require(math.abs(doc.columns(kId).ndv - doc.rowCount) <= doc.rowCount / 10 + 2,
      s"NDV estimate ${doc.columns(kId).ndv} outside the HLL error bound")
    val prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.sql("SELECT k, name FROM graft_ts.db.n")
        .queryExecution.optimizedPlan.stats
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      require(byName.get("k").exists(_.distinctCount.isDefined),
        "CBO must see the committed NDV")
      import spark.implicits._
      Seq((doc.rowCount, out.getInt(2).toLong,
        doc.columns(meta.currentSchema.fields.find(_.name == "name").get.id).nullCount,
        byName("k").min.map(_.asInstanceOf[Long]).get,
        byName("k").max.map(_.asInstanceOf[Long]).get,
        out.getString(4)))
        .toDF("n_rows", "n_cols", "nulls_name", "k_min", "k_max", "mode")
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  val tableStatsEntrySql: String =
    """WITH t AS (
      |  SELECT n_nationkey AS k,
      |    CASE WHEN n_regionkey = 2 THEN NULL ELSE n_name END AS name
      |  FROM nation
      |  UNION ALL
      |  SELECT n_nationkey + 100, n_name FROM nation WHERE n_nationkey < 5)
      |SELECT COUNT(*) AS n_rows, CAST(3 AS BIGINT) AS n_cols,
      |  CAST(SUM(CASE WHEN name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_name,
      |  CAST(MIN(k) AS BIGINT) AS k_min,
      |  CAST(MAX(k) AS BIGINT) AS k_max,
      |  'incremental' AS mode
      |FROM t""".stripMargin

  // ---------------------------------------------------------------- i84
  /** Iceberg v3 column defaults end-to-end from SQL: CREATE with DEFAULT
    * (write-default fills omitted INSERT columns via Spark's own
    * analyzer — the schema surfaces CURRENT_DEFAULT metadata), then ADD
    * COLUMN ... DEFAULT backfills every PRE-EXISTING row through the
    * readers' initial-default fill (the file predates the column — the
    * spec's v3 rule, not a null), while post-evolution inserts write
    * real values. The rollup is fully data-defined. */
  val columnDefaults: Q = (spark, sfDir) => {
    val wh = entryDir("i84", sfDir)
    spark.conf.set("spark.sql.catalog.graft_dfl",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dfl.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i84_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql("""CREATE TABLE graft_dfl.db.n
        (k BIGINT, name STRING, bonus INT DEFAULT 100)""")
      spark.sql("""INSERT INTO graft_dfl.db.n (k, name)
        SELECT n_nationkey, n_name FROM i84_nation_src WHERE n_nationkey < 15""")
      spark.sql("ALTER TABLE graft_dfl.db.n ADD COLUMN cls STRING DEFAULT 'base'")
      spark.sql("""INSERT INTO graft_dfl.db.n
        SELECT n_nationkey, n_name, CAST(n_nationkey * 2 AS INT), 'late'
        FROM i84_nation_src WHERE n_nationkey >= 15""")
    }
    spark.sql("""SELECT cls, COUNT(*) AS n, CAST(SUM(bonus) AS BIGINT) AS sum_bonus,
        CAST(SUM(k) AS BIGINT) AS sum_k
      FROM graft_dfl.db.n GROUP BY cls ORDER BY cls""")
  }

  val columnDefaultsSql: String =
    """SELECT * FROM (
      |  SELECT 'base' AS cls, COUNT(*) AS n, CAST(COUNT(*) * 100 AS BIGINT) AS sum_bonus,
      |    CAST(SUM(n_nationkey) AS BIGINT) AS sum_k
      |  FROM nation WHERE n_nationkey < 15
      |  UNION ALL
      |  SELECT 'late', COUNT(*), CAST(SUM(n_nationkey * 2) AS BIGINT),
      |    CAST(SUM(n_nationkey) AS BIGINT)
      |  FROM nation WHERE n_nationkey >= 15)
      |ORDER BY cls""".stripMargin

  // ---------------------------------------------------------------- i85
  /** Iceberg v3 DELETION VECTORS end-to-end: a v2 table accretes parquet
    * position deletes, upgrades in place (`ALTER TABLE … SET
    * TBLPROPERTIES ('format-version'='3')` — the metadata FIELD, not a
    * property), and from then on DELETE writes one Roaring-bitmap DV per
    * addressed data file into Puffin (`deletion-vector-v1` blobs,
    * manifest fields 143/144/145 seeking straight to the bitmap). The
    * v3 DELETE MERGES the file's whole pending state — the pre-upgrade
    * parquet positions get absorbed, superseded DVs drop in the same
    * commit, and at most one DV stays live per file. The closing
    * `rewrite_position_delete_files` call converts every leftover
    * parquet delete into DVs (the upgrade completion path), after which
    * the delete side is pure bitmaps — which the `position_deletes`
    * inspection table still serves per-row (one task per blob).
    *
    * The 100 TB rationale: a long-lived CDC table accretes one delete
    * file per commit, ALL of which every scan task must open and decode;
    * with DVs each task reads exactly ONE blob per data file (O(1)
    * delete-side amplification however many DELETEs ran) and the probe
    * is an unboxed bitmap lookup. */
  val deletionVectors: Q = (spark, sfDir) => {
    val wh = entryDir("i85", sfDir)
    spark.conf.set("spark.sql.catalog.graft_dv",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dv.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i85_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql(s"""CREATE TABLE graft_dv.db.n
        (n_nationkey INT, n_name STRING, n_regionkey INT)
        TBLPROPERTIES ('commit-timestamp-ms'='$T0')""")
      spark.sql("""INSERT INTO graft_dv.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i85_nation_src""")
      // v2 phase: parquet position deletes
      spark.sql("DELETE FROM graft_dv.db.n WHERE n_nationkey IN (2, 4)")
      // in-place upgrade, then a v3 DELETE overlapping the same file(s):
      // the DV must absorb the parquet positions for its file
      spark.sql("ALTER TABLE graft_dv.db.n SET TBLPROPERTIES ('format-version'='3')")
      spark.sql("DELETE FROM graft_dv.db.n WHERE n_nationkey < 6")
      def delEntries() = {
        val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/n"))
        meta.currentSnapshot.toSeq
          .flatMap(s => ManifestListReader.read(s.manifestList.get))
          .filter(_.content == 1).flatMap(i => ManifestWriter.read(i.path))
          .filter(e => e.status != 2 && e.content == 1)
      }
      val afterV3 = delEntries()
      val dvs = afterV3.filter(_.fileFormat == "PUFFIN")
      require(dvs.nonEmpty, "v3 DELETE must land deletion vectors")
      require(dvs.groupBy(_.referencedDataFile.get).values.forall(_.size == 1),
        "at most one live DV per data file")
      require(dvs.map(_.recordCount).sum == 6,
        s"DVs must absorb the v2 parquet positions: ${dvs.map(_.recordCount)}")
      dvs.foreach { e => // the blob really decodes by its manifest address
        val dv = DeletionVectors.read(
          e.filePath, e.contentOffset.get, e.contentSizeInBytes.get)
        require(dv.cardinality == e.recordCount, "cardinality drift")
      }
      // upgrade completion: every remaining parquet delete becomes a DV
      spark.sql(
        "CALL graft_dv.system.rewrite_position_delete_files(table => 'db.n')")
      val afterRw = delEntries()
      require(afterRw.nonEmpty && afterRw.forall(_.fileFormat == "PUFFIN"),
        s"rewrite on v3 must leave only DVs: ${afterRw.map(_.fileFormat)}")
    }
    spark.sql("""SELECT COUNT(*) AS n_live,
      CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      CAST(MIN(n_nationkey) AS BIGINT) AS min_key,
      (SELECT COUNT(*) FROM graft_dv.db.n.position_deletes) AS n_dv_positions
      FROM graft_dv.db.n""")
  }

  val deletionVectorsSql: String =
    """SELECT COUNT(*) AS n_live, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      |  CAST(MIN(n_nationkey) AS BIGINT) AS min_key,
      |  CAST(6 AS BIGINT) AS n_dv_positions
      |FROM nation WHERE n_nationkey >= 6""".stripMargin

  // ---------------------------------------------------------------- i86
  /** Z-order clustering rewrite: `rewrite_data_files(strategy => 'sort',
    * sort_order => 'zorder(a, b)')` re-lays the table along the Morton
    * curve (`graft.functions.ZOrderKey` — order-preserving unsigned
    * images, bit-interleaved, 8·n-byte binary key) in ONE distributed
    * pass: range-partition on the key into ceil(total/target) files,
    * sort within each, task writers tracking bound stats inline. Every
    * output file then covers a small HYPER-RECTANGLE of (a, b), so
    * min/max file pruning works for predicates on EITHER column — a
    * linear sort serves only its prefix. ZOrderSpec pins the pruning
    * claim destructively (y-only predicate: most files pruned after
    * zorder, ZERO pruned after a linear x sort); this entry pins
    * content correctness and both selective aggregates at sf. */
  val zorderRewrite: Q = (spark, sfDir) => {
    val wh = entryDir("i86", sfDir)
    spark.conf.set("spark.sql.catalog.graft_zo",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_zo.warehouse", wh)
    Tables.load(spark, sfDir, "orders").createOrReplaceTempView("i86_orders_src")
    // content-preservation gate over ALL FOUR oracle-checked values,
    // pinned from the SOURCE VIEW before the table ever exists (the
    // r13/r15 driver-side hash flake survived a COUNT+SUM-only pre/post
    // gate, which provably cannot localize a divergence in the two
    // conditional counts, nor one where the INSERT itself drifted and
    // both fingerprints were consistently wrong). Any mismatch names
    // the divergent column(s) and dumps the per-file manifest state —
    // record counts + decoded key bounds — of the live files, so a
    // driver-host-only recurrence carries its own diagnosis.
    // sum_key is BIGINT, not DECIMAL(38,0): five rounds of a hash-only
    // red on two value-identical constant rows localized the driver's
    // compare flake to the suite's sole 16-byte (FIXED_LEN_BYTE_ARRAY)
    // decimal column — int64 fits the sum at any conceivable sf
    // (~4.5e18 at sf100 < 9.2e18), and i56 keeps decimal arithmetic
    // covered on the int64-backed widths that hash clean.
    val gateCols = Seq("n_rows", "sum_key", "n_low_cust", "n_low_order")
    def vals(from: String): Seq[Any] = spark.sql(s"""SELECT COUNT(*),
      CAST(SUM(o_orderkey) AS BIGINT),
      COUNT(CASE WHEN o_custkey < 100 THEN 1 END),
      COUNT(CASE WHEN o_orderkey < 100 THEN 1 END) FROM $from""").head().toSeq
    val expected = vals("i86_orders_src")
    def fileEvidence(): String = {
      import graft.iceberg._
      val meta = TableMetadata.parseFile(
        GraftTable.latestMetadataPath(s"$wh/db/o"))
      val entries = meta.currentSnapshot.toSeq
        .flatMap(s => ManifestListReader.read(s.manifestList.get))
        .filter(_.content == 0)
        .flatMap(i => ManifestWriter.read(i.path))
        .filter(e => e.status != 2 && e.content == 0)
      def b(m: Map[Int, Array[Byte]], id: Int): String =
        m.get(id).map(SingleValueCodec.decode(IcebergTypes.TLong, _).toString)
          .getOrElse("-")
      entries.map(e => s"  ${e.filePath.split('/').last}: rows=${e.recordCount} " +
        s"o_orderkey=[${b(e.lowerBounds, 1)},${b(e.upperBounds, 1)}] " +
        s"o_custkey=[${b(e.lowerBounds, 2)},${b(e.upperBounds, 2)}]")
        .mkString("\n")
    }
    def gate(stage: String, got: Seq[Any]): Unit =
      if (got != expected) {
        val diverging = gateCols.zip(expected.zip(got)).collect {
          case (c, (e, g)) if e != g => s"$c expected=$e got=$g" }
        throw new IllegalStateException(
          s"i86 $stage diverged on [${diverging.mkString("; ")}] — " +
            s"per-file manifest state of the live files:\n${fileEvidence()}")
      }
    graft.TmpOutputs.ensure(wh) {
      spark.sql(s"""CREATE TABLE graft_zo.db.o
        (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
        TBLPROPERTIES ('commit-timestamp-ms'='$T0')""")
      spark.sql("""INSERT INTO graft_zo.db.o
        SELECT o_orderkey, o_custkey, o_totalprice FROM i86_orders_src""")
      gate("INSERT", vals("graft_zo.db.o"))
      val row = spark.sql("""CALL graft_zo.system.rewrite_data_files(
        table => 'db.o', target_file_size_bytes => 65536,
        strategy => 'sort', sort_order => 'zorder(o_custkey, o_orderkey)')""").head()
      require(row.getInt(1) >= 1, s"rewrite produced no files: $row")
      gate("zorder rewrite", vals("graft_zo.db.o"))
    }
    // the EMITTED record is itself gated and materialized ONCE: returning
    // the lazy query would hand the driver a SECOND execution of the same
    // scan (Verify forces it when writing the parquet), an ungated window
    // where a rare read divergence could still reach the oracle hash
    // without tripping any gate. With the emitted row pinned here, a
    // future driver-side hash red provably sits OUTSIDE the engine's
    // table read.
    val fin = spark.sql("""SELECT COUNT(*) AS n_rows,
      CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
      COUNT(CASE WHEN o_custkey < 100 THEN 1 END) AS n_low_cust,
      COUNT(CASE WHEN o_orderkey < 100 THEN 1 END) AS n_low_order
      FROM graft_zo.db.o""")
    val finRows = fin.collect()
    require(finRows.length == 1, s"aggregate must emit one row: ${finRows.length}")
    gate("final emission", finRows(0).toSeq)
    spark.createDataFrame(java.util.Arrays.asList(finRows: _*), fin.schema)
  }

  val zorderRewriteSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
      |  COUNT(CASE WHEN o_custkey < 100 THEN 1 END) AS n_low_cust,
      |  COUNT(CASE WHEN o_orderkey < 100 THEN 1 END) AS n_low_order
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- i87
  /** Iceberg v3 VARIANT columns: semi-structured values in the binary
    * variant encoding Spark 4 and Iceberg v3 share. The catalog persists
    * the spec type name (v3-gated: refused on v2 tables at DDL time),
    * the DSv2 task writer lands Spark's UNSHREDDED parquet variant group
    * (VARIANT-annotated `(metadata, value)` binary halves — Spark's own
    * reader reconstructs VariantType from it, so the native route reads
    * the same files), the row-route reader reassembles VariantVal
    * (variant sits outside the vectorized palette by design — no bound
    * stats either; the spec defines no variant ordering), and
    * `parse_json`/`variant_get` run over the scan like any built-in.
    * The fixture routes nation through JSON documents and extracts
    * typed values back out; the oracle recomputes from the plain
    * columns — no JSON functions on the oracle side, so the comparison
    * pins the variant ENCODE→DECODE loop itself. */
  val variantColumns: Q = (spark, sfDir) => {
    val wh = entryDir("i87", sfDir)
    spark.conf.set("spark.sql.catalog.graft_var",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_var.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i87_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql(s"""CREATE TABLE graft_var.db.n (k BIGINT, payload VARIANT)
        TBLPROPERTIES ('format-version'='3', 'commit-timestamp-ms'='$T0')""")
      spark.sql("""INSERT INTO graft_var.db.n
        SELECT CAST(n_nationkey AS BIGINT),
          parse_json(concat('{"key":', n_nationkey,
            ',"name":"', n_name, '","region":', n_regionkey, '}'))
        FROM i87_nation_src""")
      // v3 DML composes: the DELETE lands a deletion vector
      spark.sql(
        "DELETE FROM graft_var.db.n WHERE variant_get(payload, '$.region', 'int') = 2")
      val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/n"))
      require(meta.currentSchema.fields.exists(f =>
        f.name == "payload" && f.fieldType == "variant"), "variant type must persist")
    }
    spark.sql("""SELECT COUNT(*) AS n_live,
      CAST(SUM(variant_get(payload, '$.key', 'bigint')) AS BIGINT) AS sum_key,
      MAX(variant_get(payload, '$.name', 'string')) AS top_name,
      COUNT(DISTINCT variant_get(payload, '$.region', 'int')) AS n_regions
      FROM graft_var.db.n""")
  }

  val variantColumnsSql: String =
    """SELECT COUNT(*) AS n_live, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      |  MAX(n_name) AS top_name,
      |  COUNT(DISTINCT n_regionkey) AS n_regions
      |FROM nation WHERE n_regionkey <> 2""".stripMargin

  // ---------------------------------------------------------------- i88
  /** Iceberg v3 ROW LINEAGE: `_row_id` / `_last_updated_sequence_number`
    * metadata columns. Appends claim contiguous id blocks from the
    * document's `next-row-id` (manifest field 142 `first_row_id`; reads
    * serve first_row_id + pos); a MOR UPDATE preserves the updated
    * row's identity — the delta writer materializes the original
    * _row_id into its carry file — while bumping the row's
    * last-updated sequence to the update's commit; DV deletes never
    * move rows, so surviving ids are untouched. The fixture requires
    * identity stability across the UPDATE in-entry (per-key before ==
    * after) and the final aggregates pin the id set {0..24} and the
    * two distinct commit sequences order-independently — id-to-key
    * binding varies with write parallelism, the SET of assigned ids
    * does not. */
  val rowLineage: Q = (spark, sfDir) => {
    val wh = entryDir("i88", sfDir)
    spark.conf.set("spark.sql.catalog.graft_rl",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_rl.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i88_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql(s"""CREATE TABLE graft_rl.db.n
        (n_nationkey BIGINT, n_name STRING, n_regionkey INT)
        TBLPROPERTIES ('format-version'='3',
          'write.update.mode'='merge-on-read', 'commit-timestamp-ms'='$T0')""")
      spark.sql("""INSERT INTO graft_rl.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i88_nation_src""")
      val before = spark.sql("SELECT n_nationkey, _row_id FROM graft_rl.db.n")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.sql("UPDATE graft_rl.db.n SET n_name = upper(n_name) " +
        "WHERE n_regionkey = 1")
      val after = spark.sql("SELECT n_nationkey, _row_id FROM graft_rl.db.n")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      require(after == before,
        "MOR UPDATE must preserve every row's _row_id identity")
      val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/n"))
      require(meta.nextRowId.contains(25L), s"next-row-id: ${meta.nextRowId}")
    }
    spark.sql("""SELECT COUNT(*) AS n_rows,
      COUNT(DISTINCT _row_id) AS n_ids,
      CAST(MIN(_row_id) AS BIGINT) AS min_id,
      CAST(MAX(_row_id) AS BIGINT) AS max_id,
      CAST(SUM(_row_id) AS BIGINT) AS sum_ids,
      COUNT(DISTINCT _last_updated_sequence_number) AS n_commits
      FROM graft_rl.db.n""")
  }

  val rowLineageSql: String =
    """SELECT COUNT(*) AS n_rows, COUNT(*) AS n_ids,
      |  CAST(0 AS BIGINT) AS min_id,
      |  CAST(COUNT(*) - 1 AS BIGINT) AS max_id,
      |  CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS sum_ids,
      |  CAST(2 AS BIGINT) AS n_commits
      |FROM nation""".stripMargin

  // ---------------------------------------------------------------- i89
  /** Partition statistics (the spec's `partition-statistics` slot):
    * `compute_partition_stats` rolls up per-partition data AND
    * delete-side record/file/byte counts from the current snapshot's
    * manifests — zero data bytes — into one registered parquet file,
    * and the `partitions` metadata table then serves from the FILE
    * with zero manifest opens (at 10⁵ manifests, a catalog-speed
    * lookup instead of a full metadata sweep; PartitionStatsSpec
    * proves the serving route destructively by tampering the file).
    * Entries are snapshot-keyed like the table-statistics slot: stale
    * registrations fall back to the live sweep, re-analysis replaces,
    * expiry reclaims. */
  val partitionStats: Q = (spark, sfDir) => {
    val wh = entryDir("i89", sfDir)
    spark.conf.set("spark.sql.catalog.graft_ps",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ps.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i89_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql(s"""CREATE TABLE graft_ps.db.n
        (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)
        PARTITIONED BY (n_regionkey)
        TBLPROPERTIES ('commit-timestamp-ms'='$T0')""")
      spark.sql("""INSERT INTO graft_ps.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i89_nation_src""")
      val row = spark.sql(
        "CALL graft_ps.system.compute_partition_stats(table => 'db.n')").head()
      require(row.getLong(1) == 5L, s"expected 5 partitions, got $row")
      val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/n"))
      require(meta.partitionStatistics.size == 1, "registration must land")
    }
    // served FROM the registered file (zero manifest opens)
    spark.sql("""SELECT partition, CAST(record_count AS BIGINT) AS n_rows
      FROM graft_ps.db.n.partitions ORDER BY partition""")
  }

  val partitionStatsSql: String =
    """SELECT '{n_regionkey_id=' || n_regionkey || '}' AS partition,
      |  COUNT(*) AS n_rows
      |FROM nation GROUP BY n_regionkey ORDER BY partition""".stripMargin

  // ---------------------------------------------------------------- i90
  /** Per-ref retention (the spec's ref attributes): a tag created with
    * `max_ref_age_ms` AUTO-DROPS at expiry once its snapshot's age
    * exceeds it — a 30-day-TTL release tag stops pinning history by
    * itself; a branch with `min_snapshots_to_keep` RETAINS its head
    * plus that many ancestors instead of aborting the expiry; bare
    * refs keep the engine's strict contract (pin forever, expiry
    * aborts — i77). The fixture drives all three on one table and the
    * final query pins the surviving refs, snapshots, and data. */
  val refRetention: Q = (spark, sfDir) => {
    val wh = entryDir("i90", sfDir)
    spark.conf.set("spark.sql.catalog.graft_rr",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_rr.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i90_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql(s"""CREATE TABLE graft_rr.db.n
        (n_nationkey BIGINT, n_name STRING)
        TBLPROPERTIES ('commit-timestamp-ms'='$T0')""")
      spark.sql("""INSERT INTO graft_rr.db.n SELECT n_nationkey, n_name
        FROM i90_nation_src WHERE n_regionkey = 0""")
      spark.sql("""INSERT INTO graft_rr.db.n SELECT n_nationkey, n_name
        FROM i90_nation_src WHERE n_regionkey = 1""")
      spark.sql("""INSERT INTO graft_rr.db.n SELECT n_nationkey, n_name
        FROM i90_nation_src WHERE n_regionkey = 2""")
      spark.sql("""INSERT INTO graft_rr.db.n SELECT n_nationkey, n_name
        FROM i90_nation_src WHERE n_regionkey >= 3""")
      // an aged tag (commit times are the synthetic 2023 epoch, so any
      // small TTL has long elapsed) and a retention branch keeping its
      // head + one ancestor
      spark.sql("""CALL graft_rr.system.create_tag(table => 'db.n',
        tag => 'aged_release', snapshot_id => 1, max_ref_age_ms => 1)""")
      spark.sql(s"""CALL graft_rr.system.create_branch(table => 'db.n',
        branch => 'audit', snapshot_id => 2,
        max_ref_age_ms => ${Long.MaxValue / 4}L, min_snapshots_to_keep => 2)""")
      spark.sql(
        "CALL graft_rr.system.expire_snapshots(table => 'db.n', retain_last => 1)")
      val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(s"$wh/db/n"))
      require(meta.refs.map(_.name).toSet == Set("main", "audit"),
        s"aged tag must auto-drop: ${meta.refs.map(_.name)}")
      // s3 expired: s4 is keepLast's head, the audit branch retains its
      // head s2 plus one ancestor s1
      require(meta.snapshots.map(_.snapshotId).sorted == Seq(1L, 2L, 4L),
        s"branch retention must keep s1+s2: ${meta.snapshots.map(_.snapshotId)}")
    }
    spark.sql("""SELECT COUNT(*) AS n_rows,
      (SELECT COUNT(*) FROM graft_rr.db.n.refs) AS n_refs,
      (SELECT COUNT(*) FROM graft_rr.db.n.snapshots) AS n_snapshots
      FROM graft_rr.db.n""")
  }

  // ---------------------------------------------------------------- i91
  /** Iceberg v3 nanosecond timestamps round-tripped: `timestamp_ns` /
    * `timestamptz_ns` columns (spec "Version 3 types") surface in Spark
    * as LongType nanos-since-epoch (no ns type exists there — see
    * IcebergTypes.TTimestampNs), the task writer annotates the parquet
    * column TIMESTAMP(NANOS) so foreign readers recover real nanosecond
    * timestamps, footer/inline bounds encode as LE long nanos, and the
    * scan prunes on them. Spark DDL cannot express the type, so the
    * table is created through the engine API (the route Iceberg users
    * take for ns tables); creation on a v2 table refuses
    * (NsTimestampSpec pins gate, annotation and pruning). */
  val timestampNs: Q = (spark, sfDir) => {
    val wh = entryDir("i91", sfDir)
    spark.conf.set("spark.sql.catalog.graft_ns",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ns.warehouse", wh)
    Tables.load(spark, sfDir, "events").createOrReplaceTempView("i91_events_src")
    graft.TmpOutputs.ensure(wh) {
      GraftTable.create(s"$wh/db/e", IcebergSchema(0, Seq(
        IcebergField(1, "event_id", required = false, fieldType = "long"),
        IcebergField(2, "ts_ns", required = false, fieldType = "timestamp_ns"),
        IcebergField(3, "tz_ns", required = false, fieldType = "timestamptz_ns"),
        IcebergField(4, "event_type", required = false, fieldType = "string"))),
        tableUuid = java.util.UUID.randomUUID().toString,
        timestampMs = T0, formatVersion = 3)
      spark.sql("""INSERT INTO graft_ns.db.e
        SELECT event_id, unix_micros(ts) * 1000, unix_micros(ts) * 1000 + 1,
          event_type FROM i91_events_src""")
    }
    // whole-domain aggregate + a selective ns-bound predicate (prunable
    // via the encoded long-nanos file stats)
    spark.sql("""SELECT COUNT(*) AS n_rows,
      MIN(ts_ns) AS min_ns, MAX(tz_ns) AS max_ns,
      COUNT(CASE WHEN ts_ns < 1704844800000000000 THEN 1 END) AS n_early
      FROM graft_ns.db.e""")
  }

  val timestampNsSql: String =
    """SELECT COUNT(*) AS n_rows, MIN(epoch_ns(ts)) AS min_ns,
      |  MAX(epoch_ns(ts) + 1) AS max_ns,
      |  COUNT(CASE WHEN epoch_ns(ts) < 1704844800000000000 THEN 1 END) AS n_early
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- i92
  /** `register_table` — the fourth onboarding path (after add_files/
    * migrate/snapshot: i74/i80/i79): adopt an EXISTING table, current
    * metadata.json and all history, into the catalog BY REFERENCE. No
    * file is rewritten or moved — the catalog entry is a pointer, and
    * every operation through the new identifier (scans, DML,
    * procedures) lands in the original directory, so both identifiers
    * always see one table. DROP removes only the pointer (the i79-style
    * ownership guard: catalog cleanup can never delete the adopted
    * files). The fixture registers a foreign-catalog table, appends
    * THROUGH the registered identifier, and pins that the source
    * identifier sees the append. */
  val registerTable: Q = (spark, sfDir) => {
    val root = entryDir("i92", sfDir)
    spark.conf.set("spark.sql.catalog.graft_rgs",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_rgs.warehouse", s"$root/src")
    spark.conf.set("spark.sql.catalog.graft_rg",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_rg.warehouse", s"$root/wh")
    Tables.load(spark, sfDir, "supplier").createOrReplaceTempView("i92_supplier_src")
    graft.TmpOutputs.ensure(root) {
      spark.sql(s"""CREATE TABLE graft_rgs.db.orig
        (s_suppkey BIGINT, s_name STRING, s_acctbal DOUBLE)
        TBLPROPERTIES ('commit-timestamp-ms'='$T0')""")
      spark.sql("""INSERT INTO graft_rgs.db.orig
        SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE)
        FROM i92_supplier_src""")
      val metaFile = GraftTable.latestMetadataPath(s"$root/src/db/orig")
      val row = spark.sql(s"""CALL graft_rg.system.register_table(
        table => 'db.adopted', metadata_file => '$metaFile')""").head()
      require(row.getString(0) == s"$root/src/db/orig", s"bad location: $row")
      // a commit through the REGISTERED identifier...
      spark.sql("""INSERT INTO graft_rg.db.adopted
        SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE)
        FROM i92_supplier_src WHERE s_suppkey <= 10""")
    }
    // ...is visible through BOTH identifiers (one table, two names)
    spark.sql("""SELECT COUNT(*) AS n_rows,
      CAST(SUM(s_suppkey) AS BIGINT) AS sum_key,
      (SELECT COUNT(*) FROM graft_rgs.db.orig) AS n_via_src
      FROM graft_rg.db.adopted""")
  }

  // ---------------------------------------------------------------- i95
  /** Geometry VALUES over the v3 `geometry` column (i91 added the type;
    * this adds the value layer): `graft_st_point(x, y)` builds canonical
    * little-endian WKB, the task writer lands it as the column's binary
    * payload — folding the spec's BOUNDING-BOX bounds inline (lower =
    * min x/min y, upper = max x/max y as WKB points; GeoBoundsSpec) —
    * and `graft_st_x`/`graft_st_y` read the coordinates
    * back through whole-stage codegen. Coordinates are dyadic rationals
    * (multiples of 0.25), so every SUM is EXACT in IEEE double whatever
    * the aggregation order — cross-engine equality without tolerance. */
  val geometryPoints: Q = (spark, sfDir) => {
    val wh = entryDir("i95", sfDir)
    spark.conf.set("spark.sql.catalog.graft_geo",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_geo.warehouse", wh)
    Tables.load(spark, sfDir, "customer").createOrReplaceTempView("i95_customer_src")
    graft.functions.GraftFunctions.register(spark)
    graft.TmpOutputs.ensure(wh) {
      GraftTable.create(s"$wh/db/g", IcebergSchema(0, Seq(
        IcebergField(1, "id", required = false, fieldType = "long"),
        IcebergField(2, "loc", required = false, fieldType = "geometry"))),
        tableUuid = java.util.UUID.randomUUID().toString,
        timestampMs = T0, formatVersion = 3)
      spark.sql("""INSERT INTO graft_geo.db.g
        SELECT c_custkey, graft_st_point(
          CAST(c_custkey % 360 AS DOUBLE) - 180 + 0.5,
          CAST(c_custkey % 180 AS DOUBLE) - 90 + 0.25)
        FROM i95_customer_src""")
    }
    spark.sql("""SELECT COUNT(*) AS n_points,
      CAST(SUM(graft_st_x(loc)) AS DOUBLE) AS sum_x,
      CAST(SUM(graft_st_y(loc)) AS DOUBLE) AS sum_y,
      CAST(MAX(graft_st_x(loc)) AS DOUBLE) AS max_x
      FROM graft_geo.db.g""")
  }

  val geometryPointsSql: String =
    """SELECT COUNT(*) AS n_points,
      |  CAST(SUM((c_custkey % 360) - 180 + 0.5) AS DOUBLE) AS sum_x,
      |  CAST(SUM((c_custkey % 180) - 90 + 0.25) AS DOUBLE) AS sum_y,
      |  CAST(MAX((c_custkey % 360) - 180 + 0.5) AS DOUBLE) AS max_x
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- i94
  /** `write.format.default` honored by the TASK WRITERS — the write
    * half of the i75/i78 foreign-format story: an avro- or orc-imported
    * table appends IN-KIND instead of silently mixing parquet in. The
    * fixture CREATEs with `write.format.default='avro'` (the first
    * INSERT's task files are Avro object containers with inline bound
    * stats — manifests don't care about data format, so they prune like
    * parquet), imports a foreign Avro container, flips the property to
    * orc and appends again (ORC task files), then pins via the `files`
    * metadata table that NO parquet file exists before the mixed
    * three-source scan hash-checks against the oracle. */
  val formatDefaultWrites: Q = (spark, sfDir) => {
    val wh = entryDir("i94", sfDir)
    spark.conf.set("spark.sql.catalog.graft_fmt",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_fmt.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i94_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql(s"""CREATE TABLE graft_fmt.db.n
        (n_nationkey INT, n_name STRING, n_regionkey INT)
        TBLPROPERTIES ('write.format.default'='avro',
          'commit-timestamp-ms'='$T0')""")
      spark.sql("""INSERT INTO graft_fmt.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i94_nation_src
        WHERE n_regionkey < 2""")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_nationkey",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("n_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_regionkey",
          org.apache.spark.sql.types.IntegerType)))
      val rows = spark.sql("""SELECT n_nationkey, n_name, n_regionkey
        FROM i94_nation_src WHERE n_regionkey IN (2, 3)
        ORDER BY n_nationkey""").collect().toSeq
      AvroDataFiles.write(s"$wh/avro_src/part-00000.avro", schema, rows)
      spark.sql("""CALL graft_fmt.system.add_files(table => 'db.n',
        source_dir => '""" + wh + """/avro_src', format => 'avro')""")
      spark.sql("""ALTER TABLE graft_fmt.db.n
        SET TBLPROPERTIES ('write.format.default'='orc')""")
      spark.sql("""INSERT INTO graft_fmt.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i94_nation_src
        WHERE n_regionkey >= 4""")
      val fmts = spark.sql("""SELECT DISTINCT file_format
          FROM graft_fmt.db.n.entries WHERE status != 2 AND content = 0""")
        .collect().map(_.getString(0)).toSet
      require(fmts == Set("AVRO", "ORC"),
        s"expected in-kind avro+orc data files only, got $fmts")
    }
    spark.sql("""SELECT n_regionkey, COUNT(*) AS n,
      CAST(SUM(n_nationkey) AS BIGINT) AS sum_key, MAX(n_name) AS top_name
      FROM graft_fmt.db.n GROUP BY n_regionkey ORDER BY n_regionkey""")
  }

  val formatDefaultWritesSql: String =
    """SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      |  MAX(n_name) AS top_name
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  // ---------------------------------------------------------------- i93
  /** Changelog compute-updates:
    * `create_changelog_view(identifier_columns => 'k')` pairs each
    * commit's delete+insert on the identifier into
    * update_before/update_after — the shape CDC consumers (Flink-style
    * upsert sinks) expect — and drops CARRY-OVER pairs (identical
    * images: a copy-on-write rewrite moved the row, nothing changed).
    * The fixture drives both DML modes: a merge-on-read UPDATE (ordinal
    * 1: pos-delete + new file in one commit) and a copy-on-write UPDATE
    * (ordinal 2: whole-file rewrite whose untouched rows emit identical
    * pairs). Carry-over removal is what makes the COW ordinal's rollup
    * LAYOUT-INDEPENDENT — without it every co-located row would leak
    * into the changelog and the oracle would depend on file boundaries. */
  val changelogUpdates: Q = (spark, sfDir) => {
    val wh = entryDir("i93", sfDir)
    spark.conf.set("spark.sql.catalog.graft_cdu",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cdu.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i93_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql(s"""CREATE TABLE graft_cdu.db.n
        (k BIGINT, name STRING, r BIGINT)
        TBLPROPERTIES ('write.update.mode'='merge-on-read',
          'commit-timestamp-ms'='$T0')""")
      spark.sql("""INSERT INTO graft_cdu.db.n
        SELECT n_nationkey, n_name, n_regionkey FROM i93_nation_src""")
      spark.sql("UPDATE graft_cdu.db.n SET name = concat(name, '_M') WHERE r = 0")
      spark.sql("""ALTER TABLE graft_cdu.db.n
        SET TBLPROPERTIES ('write.update.mode'='copy-on-write')""")
      spark.sql("UPDATE graft_cdu.db.n SET name = concat(name, '_C') WHERE r = 1")
    }
    spark.sql("""CALL graft_cdu.system.create_changelog_view(
      table => 'db.n', changelog_view => 'i93_changes',
      identifier_columns => 'k')""")
    spark.sql("""SELECT _change_ordinal AS ordinal, _change_type AS op,
        COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
      FROM i93_changes GROUP BY _change_ordinal, _change_type
      ORDER BY ordinal, op""")
  }

  val changelogUpdatesSql: String =
    """SELECT * FROM (
      |  SELECT 0 AS ordinal, 'insert' AS op, COUNT(*) AS n,
      |    CAST(SUM(n_nationkey) AS BIGINT) AS sum_k FROM nation
      |  UNION ALL
      |  SELECT 1, 'update_after', COUNT(*), CAST(SUM(n_nationkey) AS BIGINT)
      |  FROM nation WHERE n_regionkey = 0
      |  UNION ALL
      |  SELECT 1, 'update_before', COUNT(*), CAST(SUM(n_nationkey) AS BIGINT)
      |  FROM nation WHERE n_regionkey = 0
      |  UNION ALL
      |  SELECT 2, 'update_after', COUNT(*), CAST(SUM(n_nationkey) AS BIGINT)
      |  FROM nation WHERE n_regionkey = 1
      |  UNION ALL
      |  SELECT 2, 'update_before', COUNT(*), CAST(SUM(n_nationkey) AS BIGINT)
      |  FROM nation WHERE n_regionkey = 1
      |) ORDER BY ordinal, op""".stripMargin

  val registerTableSql: String =
    """SELECT COUNT(*) AS n_rows, CAST(SUM(s_suppkey) AS BIGINT) AS sum_key,
      |  COUNT(*) AS n_via_src
      |FROM (SELECT s_suppkey FROM supplier UNION ALL
      |      SELECT s_suppkey FROM supplier WHERE s_suppkey <= 10)""".stripMargin

  val refRetentionSql: String =
    """SELECT COUNT(*) AS n_rows, CAST(2 AS BIGINT) AS n_refs,
      |  CAST(3 AS BIGINT) AS n_snapshots
      |FROM nation""".stripMargin

  // ---------------------------------------------------------------- i96
  /** ATOMIC `[CREATE OR] REPLACE TABLE … AS SELECT` through the staging
    * catalog ([[graft.sources.GraftCatalog]] implements Spark's
    * `StagingTableCatalog`, so Spark plans the ATOMIC exec instead of
    * its drop-then-create fallback — which DESTROYS the table when the
    * query fails and starts a fresh history when it succeeds). Three
    * contracts driven in-entry:
    *
    *   - **failure atomicity**: a REPLACE whose query raises mid-write
    *     leaves the table exactly as it was (the staged files are
    *     deleted, the version chain never moved);
    *   - **self-reference**: the replace SELECT reads the table being
    *     replaced (compact-into-a-summary-of-itself — impossible under
    *     drop-then-create, which would delete the data out from under
    *     the scan);
    *   - **history survives**: the replace appends schema + spec and
    *     commits ONE truncate-overwrite snapshot; the pre-replace
    *     snapshot stays time-travelable and `VERSION AS OF` reads it
    *     under the OLD schema (the Iceberg time-travel rule).
    *
    * The invariants surface as output columns so the oracle hash pins
    * them: n_snapshots = 2 (insert + replace — the failed attempt
    * committed NOTHING), old_rows/old_sum = the pre-replace table read
    * back through time travel. */
  val replaceTable: Q = (spark, sfDir) => {
    val wh = entryDir("i96", sfDir)
    spark.conf.set("spark.sql.catalog.graft_rpl",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_rpl.warehouse", wh)
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("i96_nation_src")
    graft.TmpOutputs.ensure(wh) {
      spark.sql(s"""CREATE TABLE graft_rpl.db.t
        (n_nationkey INT, n_name STRING, n_regionkey INT)
        TBLPROPERTIES ('commit-timestamp-ms'='$T0')""")
      spark.sql("""INSERT INTO graft_rpl.db.t
        SELECT n_nationkey, n_name, n_regionkey FROM i96_nation_src""")
      val failed =
        try {
          spark.sql("""REPLACE TABLE graft_rpl.db.t AS
            SELECT CASE WHEN n_nationkey >= 0 THEN raise_error('i96 planned failure')
              ELSE 0L END AS x FROM i96_nation_src""")
          false
        } catch { case _: Throwable => true }
      require(failed, "the poisoned REPLACE must fail")
      require(spark.sql("SELECT COUNT(*) FROM graft_rpl.db.t").head().getLong(0) == 25,
        "a failed REPLACE must leave the table intact")
      spark.sql("""CREATE OR REPLACE TABLE graft_rpl.db.t AS
        SELECT n_regionkey AS r_key, COUNT(*) AS n_nations,
          CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
        FROM graft_rpl.db.t GROUP BY n_regionkey""")
    }
    val meta = TableMetadata.parseFile(
      GraftTable.latestMetadataPath(s"$wh/db/t"))
    val oldSnap = meta.snapshots.minBy(_.snapshotId)
    val old = spark.sql(
      s"SELECT * FROM graft_rpl.db.t VERSION AS OF ${oldSnap.snapshotId}")
    require(old.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"),
      s"time travel must read the PRE-replace schema, got " +
        old.schema.fieldNames.mkString(","))
    val oldAgg = old.agg(count(lit(1)), sum(col("n_nationkey")).cast("long")).head()
    spark.table("graft_rpl.db.t")
      .withColumn("n_snapshots", lit(meta.snapshots.size))
      .withColumn("old_rows", lit(oldAgg.getLong(0)))
      .withColumn("old_sum", lit(oldAgg.getLong(1)))
      .orderBy(col("r_key"))
  }

  val replaceTableSql: String =
    """SELECT n_regionkey AS r_key, COUNT(*) AS n_nations,
      |  CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      |  2 AS n_snapshots, CAST(25 AS BIGINT) AS old_rows,
      |  CAST(300 AS BIGINT) AS old_sum
      |FROM nation GROUP BY n_regionkey ORDER BY r_key""".stripMargin

  // ---------------------------------------------------------------- i97
  /** `delete_reachable_files` — the cleanup half of un-cataloging a
    * table: walk a metadata document's ENTIRE reachable set (all
    * metadata-log versions, every snapshot's manifest list → manifests →
    * content files of every status, statistics files) and delete it.
    * This is what reclaims the bytes after a `register_table` pointer
    * DROP (which by design keeps the files), or for a detached
    * directory no catalog serves. The entry drives the full lifecycle —
    * create, append, MOR DELETE (so a position-delete file is
    * reachable), ANALYZE (so a statistics puffin is reachable) — then
    * a dry run (counts, nothing deleted, table still readable), the
    * real deletion, and a recursive directory sweep proving NOTHING
    * survived. Dry-run/real count equality and the zero-leftover gate
    * surface as oracle-pinned columns; the table builds fresh every
    * pass because the entry ends by destroying it. */
  val deleteReachable: Q = (spark, sfDir) => {
    import org.apache.hadoop.fs.Path
    val root = entryDir("i97", sfDir)
    val dir = s"$root/db/t"
    spark.conf.set("spark.sql.catalog.graft_drf",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_drf.warehouse", root)
    val fs = HadoopConfs.fileSystemFor(root)
    fs.delete(new Path(root), true)
    GraftTable.create(dir, IcebergSchema(0, Seq(
      IcebergField(1, "n_nationkey", required = false, "int"),
      IcebergField(2, "n_name", required = false, "string"),
      IcebergField(3, "n_regionkey", required = false, "int"))),
      tableUuid = "b6b9a6a1-0000-4000-8000-000000000097", timestampMs = T0)
    GraftTable.append(spark, dir, Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey")))
    GraftTable.deleteWhere(spark, dir, col("n_nationkey") >= 20)
    GraftTable.computeTableStats(spark, dir)
    val pre = GraftTable.read(spark, GraftTable.latestMetadataPath(dir))
      .agg(count(lit(1)), sum(col("n_nationkey")).cast("long")).head()
    val metaFile = GraftTable.latestMetadataPath(dir)
    val dry = spark.sql(s"""CALL graft_drf.system.delete_reachable_files(
      metadata_file => '$metaFile', dry_run => true)""").head()
    require(GraftTable.read(spark, GraftTable.latestMetadataPath(dir)).count()
        == pre.getLong(0), "dry run must not delete anything")
    val real = spark.sql(s"""CALL graft_drf.system.delete_reachable_files(
      metadata_file => '$metaFile')""").head()
    require(dry == real,
      s"dry-run counts must match the real deletion: $dry vs $real")
    val leftovers =
      if (!fs.exists(new Path(dir))) 0
      else {
        val it = fs.listFiles(new Path(dir), true)
        var n = 0
        while (it.hasNext) { it.next(); n += 1 }
        n
      }
    import spark.implicits._
    Seq((pre.getLong(0), pre.getLong(1), real.getInt(0), real.getInt(1),
      real.getInt(2), real.getInt(3), real.getInt(4), leftovers))
      .toDF("n_rows_before", "sum_before", "content_files", "manifests",
        "manifest_lists", "metadata_files", "statistics_files", "n_leftover_files")
  }

  val deleteReachableSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_before,
      |  CAST(SUM(n_nationkey) AS BIGINT) AS sum_before,
      |  2 AS content_files, 2 AS manifests, 2 AS manifest_lists,
      |  5 AS metadata_files, 1 AS statistics_files, 0 AS n_leftover_files
      |FROM nation WHERE n_nationkey < 20""".stripMargin

  val queries: Map[String, Q] = Map(
    "i97_delete_reachable" -> deleteReachable,
    "i96_replace_table" -> replaceTable,
    "i95_geometry_points" -> geometryPoints,
    "i94_format_default" -> formatDefaultWrites,
    "i93_changelog_updates" -> changelogUpdates,
    "i92_register_table" -> registerTable,
    "i91_timestamp_ns" -> timestampNs,
    "i90_ref_retention" -> refRetention,
    "i89_partition_stats" -> partitionStats,
    "i88_row_lineage" -> rowLineage,
    "i87_variant_columns" -> variantColumns,
    "i86_zorder_rewrite" -> zorderRewrite,
    "i85_deletion_vectors" -> deletionVectors,
    "i84_column_defaults" -> columnDefaults,
    "i83_table_stats" -> tableStatsEntry,
    "i82_changelog_view" -> changelogView,
    "i72_entries_table" -> entriesTable,
    "i73_rename_column" -> renameColumn,
    "i74_add_files" -> addFilesImport,
    "i75_avro_data_files" -> avroMixed,
    "i76_position_deletes" -> positionDeletes,
    "i77_ref_lifecycle" -> refLifecycle,
    "i78_orc_data_files" -> orcMixed,
    "i79_snapshot_fork" -> snapshotFork,
    "i80_migrate_dir" -> migrateDir)

  val oracles: Map[String, String] = Map(
    "i97_delete_reachable" -> deleteReachableSql,
    "i96_replace_table" -> replaceTableSql,
    "i95_geometry_points" -> geometryPointsSql,
    "i94_format_default" -> formatDefaultWritesSql,
    "i93_changelog_updates" -> changelogUpdatesSql,
    "i92_register_table" -> registerTableSql,
    "i91_timestamp_ns" -> timestampNsSql,
    "i90_ref_retention" -> refRetentionSql,
    "i89_partition_stats" -> partitionStatsSql,
    "i88_row_lineage" -> rowLineageSql,
    "i87_variant_columns" -> variantColumnsSql,
    "i86_zorder_rewrite" -> zorderRewriteSql,
    "i85_deletion_vectors" -> deletionVectorsSql,
    "i84_column_defaults" -> columnDefaultsSql,
    "i83_table_stats" -> tableStatsEntrySql,
    "i82_changelog_view" -> changelogViewSql,
    "i72_entries_table" -> entriesTableSql,
    "i73_rename_column" -> renameColumnSql,
    "i74_add_files" -> addFilesImportSql,
    "i75_avro_data_files" -> avroMixedSql,
    "i76_position_deletes" -> positionDeletesSql,
    "i77_ref_lifecycle" -> refLifecycleSql,
    "i78_orc_data_files" -> orcMixedSql,
    "i79_snapshot_fork" -> snapshotForkSql,
    "i80_migrate_dir" -> migrateDirSql)
}
