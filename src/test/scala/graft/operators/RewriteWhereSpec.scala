package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.iceberg.{GraftTable, ManifestListReader, ManifestListWriter, ManifestWriter, TableMetadata, TableStats}

/** Partial compaction — `rewrite_data_files(where => ...)` (upstream
  * RewriteDataFiles' filter): only files whose bound stats may contain
  * matching rows rewrite; everything else carries VERBATIM with its
  * manifests. The selection is planning-level and conservative, the
  * rewrite of a selected file is always whole-file. At 100 TB the
  * nightly sweep compacts the hot key range, not the table — proven
  * destructively here: the non-matching files are garbage on disk and
  * the rewrite succeeds because they are never opened. */
class RewriteWhereSpec extends SparkSpec {

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  private def listPaths(dir: String): Seq[String] =
    TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
      .currentSnapshot.flatMap(_.manifestList).toSeq
      .flatMap(ManifestListReader.read).map(_.path)

  private def liveFiles(dir: String): Set[String] =
    TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
      .currentSnapshot.flatMap(_.manifestList).toSeq
      .flatMap(ManifestListReader.read).filter(_.content == 0)
      .flatMap(i => ManifestWriter.read(i.path))
      .filter(e => e.status != 2 && e.content == 0)
      .map(e => norm(e.filePath)).toSet

  /** live file path (normalized) -> [min k, max k], read through the scan. */
  private def fileRanges(dir: String): Map[String, (Long, Long)] =
    spark.read.format("graft-table")
      .option("metadata", GraftTable.latestMetadataPath(dir)).load()
      .groupBy(col("_file")).agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      .collect().map(r => norm(r.getString(0)) -> (r.getLong(1), r.getLong(2)))
      .toMap

  private def corrupt(p: String): Unit = java.nio.file.Files.write(
    java.nio.file.Paths.get(p),
    "garbage: a where-scoped rewrite must never open this".getBytes("UTF-8"))

  test("where-scoped rewrite opens ONLY matching files and carries " +
      "unaffected manifests verbatim") {
    val wh = java.nio.file.Files.createTempDirectory("graft-rww").toString
    spark.conf.set("spark.sql.catalog.grww", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grww.warehouse", wh)
    spark.sql("CREATE TABLE grww.db.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO grww.db.t SELECT id, CONCAT('a', id) FROM RANGE(10)")
    spark.sql("INSERT INTO grww.db.t SELECT id, CONCAT('b', id) FROM RANGE(10, 20)")
    spark.sql("INSERT INTO grww.db.t SELECT id, CONCAT('c', id) FROM RANGE(20, 30)")
    val dir = s"$wh/db/t"
    val ranges = fileRanges(dir)
    val excluded = ranges.filter(_._2._2 < 20).keys.toSet
    val matching = ranges.keySet -- excluded
    assert(excluded.nonEmpty && matching.nonEmpty, ranges.toString)
    val manifestsBefore = listPaths(dir)
      .filterNot(p => ManifestWriter.read(p).exists(e =>
        e.content == 0 && !excluded(norm(e.filePath))))
    assert(manifestsBefore.size == 2,
      s"the two k<20 appends own fully-excluded manifests: $manifestsBefore")
    // the files whose bounds provably exclude k >= 20: destroy them —
    // the rewrite succeeds only if it never opens them
    excluded.foreach(corrupt)
    val out = spark.sql("CALL grww.system.rewrite_data_files(" +
      "table => 'db.t', where => 'k >= 20')").head
    // counts are files ACTUALLY rewritten/added (upstream procedure
    // parity), not table totals: 1 matching file rewrote into 1
    assert(out.getInt(0) == matching.size && out.getInt(1) == 1,
      out.toString)
    val after = liveFiles(dir)
    // the excluded files survive at their ORIGINAL paths; the matching
    // one was replaced
    assert(after.intersect(ranges.keySet) == excluded,
      s"ranges=$ranges after=$after")
    // unaffected manifests carried VERBATIM (same physical paths — their
    // summaries and stats keep list-level pruning alive)
    val manifestsAfter = listPaths(dir)
    assert(manifestsBefore.forall(manifestsAfter.contains),
      s"carried=$manifestsBefore after=$manifestsAfter")
    // the rewritten range reads back exactly
    val kept = spark.sql("SELECT k, s FROM grww.db.t WHERE k >= 20 ORDER BY k")
      .collect()
    assert(kept.length == 10 && kept.head.getLong(0) == 20L &&
      kept.last.getString(1) == "c29")
    // sort strategy composes with where: re-cluster ONLY the hot range
    // (the corrupted files are still never opened)
    spark.sql("CALL grww.system.rewrite_data_files(table => 'db.t', " +
      "strategy => 'sort', sort_order => 'k DESC', where => 'k >= 20')")
    assert(spark.sql("SELECT COUNT(*) FROM grww.db.t WHERE k >= 20")
      .head.getLong(0) == 10L)
    assert(liveFiles(dir).intersect(excluded) == excluded)
  }

  test("where-scoped rewrite keeps delete files in force for carried " +
      "files and materializes them for rewritten ones") {
    val wh = java.nio.file.Files.createTempDirectory("graft-rwd").toString
    spark.conf.set("spark.sql.catalog.grwd", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grwd.warehouse", wh)
    spark.sql("CREATE TABLE grwd.db.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO grwd.db.t SELECT id, CONCAT('a', id) FROM RANGE(10)")
    spark.sql("INSERT INTO grwd.db.t SELECT id, CONCAT('b', id) FROM RANGE(10, 20)")
    spark.sql("DELETE FROM grwd.db.t WHERE k = 3 OR k = 15")
    val dir = s"$wh/db/t"
    assert(spark.sql("SELECT COUNT(*) FROM grwd.db.t").head.getLong(0) == 18L)
    // rewrite only [0,10): k=3 materializes away; the carried file's
    // k=15 must STAY deleted (its delete file carries forward)
    spark.sql("CALL grwd.system.rewrite_data_files(" +
      "table => 'db.t', where => 'k < 10')")
    assert(spark.sql("SELECT COUNT(*) FROM grwd.db.t").head.getLong(0) == 18L)
    assert(spark.sql("SELECT COUNT(*) FROM grwd.db.t WHERE k IN (3, 15)")
      .head.getLong(0) == 0L)
    // delete manifests were carried
    val delManifests = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
      .currentSnapshot.flatMap(_.manifestList).toSeq
      .flatMap(ManifestListReader.read).filter(_.content == 1)
    assert(delManifests.nonEmpty, "the delete manifest must carry forward")
    // a where-scoped rewrite is an ordinary `replace`: incremental
    // ANALYZE stays O(delta) across it
    spark.sql("CALL grwd.system.compute_table_stats(table => 'db.t')")
    spark.sql("INSERT INTO grwd.db.t SELECT id, CONCAT('d', id) FROM RANGE(20, 25)")
    spark.sql("CALL grwd.system.rewrite_data_files(" +
      "table => 'db.t', where => 'k >= 10 AND k < 20')")
    val stats = spark.sql(
      "CALL grwd.system.compute_table_stats(table => 'db.t', incremental => true)").head
    assert(stats.getString(4) == "incremental", stats.toString)
    assert(stats.getLong(1) == 23L, stats.toString)
  }

  test("FULL binpack compaction bins WITHIN partitions: per-tuple output " +
      "manifests keep list pruning and the sketch bank alive") {
    val wh = java.nio.file.Files.createTempDirectory("graft-rwp").toString
    spark.conf.set("spark.sql.catalog.grwp", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grwp.warehouse", wh)
    spark.sql("CREATE TABLE grwp.db.t (k BIGINT, r BIGINT) PARTITIONED BY (r)")
    spark.sql("INSERT INTO grwp.db.t SELECT id, id % 3 FROM RANGE(30)")
    spark.sql("INSERT INTO grwp.db.t SELECT id, id % 3 FROM RANGE(30, 60)")
    val dir = s"$wh/db/t"
    assert(liveFiles(dir).size == 6) // two files per partition
    val out = spark.sql(
      "CALL grwp.system.rewrite_data_files(table => 'db.t')").head
    // upstream shape: 6 rewritten into ONE output per partition — a bin
    // never spans tuples, so partitions never merge into shared files
    assert(out.getInt(0) == 6 && out.getInt(1) == 3, out.toString)
    val spread = spark.sql(
      "SELECT _file, COUNT(DISTINCT r) AS nr FROM grwp.db.t GROUP BY _file")
      .collect()
    assert(spread.length == 3 && spread.forall(_.getLong(1) == 1L),
      spread.mkString(";"))
    // the compacted layout still banks per partition (per-tuple output
    // manifests carry the field-507 summaries forward)
    spark.sql("CALL grwp.system.compute_table_stats(table => 'db.t')")
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val sk = TableStats.readWithSketches(meta.statistics
      .find(_.snapshotId == meta.currentSnapshotId.get).get.path)
    assert(sk.bank.keySet == Set("{r_id=0}", "{r_id=1}", "{r_id=2}"),
      sk.bank.keySet)
    // and list-level pruning survives: destroy the OTHER partitions'
    // output bytes — the r=1 read plans past them without opening
    spark.read.format("graft-table")
      .option("metadata", GraftTable.latestMetadataPath(dir)).load()
      .filter(col("r") =!= 1).select(col("_file")).distinct()
      .collect().map(_.getString(0)).foreach(corrupt)
    val row = spark.sql(
      "SELECT COUNT(*), CAST(SUM(k) AS BIGINT) FROM grwp.db.t WHERE r = 1").head
    assert(row.getLong(0) == 20L && row.getLong(1) == 590L, row.toString)
  }

  test("a PARTIAL rewrite spanning partitions lands per-tuple outputs — " +
      "the sketch bank stays live through a where-scoped sweep") {
    val wh = java.nio.file.Files.createTempDirectory("graft-rwm").toString
    spark.conf.set("spark.sql.catalog.grwm", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grwm.warehouse", wh)
    spark.sql("CREATE TABLE grwm.db.t (k BIGINT, r BIGINT) PARTITIONED BY (r)")
    spark.sql("INSERT INTO grwm.db.t SELECT id, id % 3 FROM RANGE(30)")
    spark.sql("INSERT INTO grwm.db.t SELECT id, id % 3 FROM RANGE(30, 60)")
    val dir = s"$wh/db/t"
    // the where selects every file (all bounds may contain k < 100) but
    // routes through the PARTIAL branch — outputs must still be
    // partition-pure with tupled manifests, never one shared manifest
    val out = spark.sql("CALL grwm.system.rewrite_data_files(" +
      "table => 'db.t', where => 'k < 100')").head
    assert(out.getInt(0) == 6 && out.getInt(1) == 3, out.toString)
    val spread = spark.sql(
      "SELECT _file, COUNT(DISTINCT r) AS nr FROM grwm.db.t GROUP BY _file")
      .collect()
    assert(spread.length == 3 && spread.forall(_.getLong(1) == 1L),
      spread.mkString(";"))
    spark.sql("CALL grwm.system.compute_table_stats(table => 'db.t')")
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val sk = TableStats.readWithSketches(meta.statistics
      .find(_.snapshotId == meta.currentSnapshotId.get).get.path)
    assert(sk.bank.keySet == Set("{r_id=0}", "{r_id=1}", "{r_id=2}"),
      sk.bank.keySet)
    assert(spark.sql("SELECT COUNT(*), CAST(SUM(k) AS BIGINT) FROM grwm.db.t")
      .head.toSeq == Seq(60L, 1770L))
  }

  test("where + sort compose on a partitioned table: clustered PARTIAL " +
      "outputs stay partition-pure and bank-visible") {
    val wh = java.nio.file.Files.createTempDirectory("graft-rwz").toString
    spark.conf.set("spark.sql.catalog.grwz", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grwz.warehouse", wh)
    spark.sql("CREATE TABLE grwz.db.t (k BIGINT, r BIGINT) PARTITIONED BY (r)")
    spark.sql("INSERT INTO grwz.db.t SELECT id, id % 3 FROM RANGE(30)")
    spark.sql("INSERT INTO grwz.db.t SELECT id, id % 3 FROM RANGE(30, 60)")
    val dir = s"$wh/db/t"
    // the partial branch with the SORTED tag route: every file selected,
    // clustered per partition — outputs must be partition-pure
    spark.sql("CALL grwz.system.rewrite_data_files(table => 'db.t', " +
      "where => 'k < 100', strategy => 'sort', sort_order => 'k DESC')")
    val spread = spark.sql(
      "SELECT _file, COUNT(DISTINCT r) AS nr FROM grwz.db.t GROUP BY _file")
      .collect()
    assert(spread.forall(_.getLong(1) == 1L), spread.mkString(";"))
    assert(spark.sql("SELECT COUNT(*), CAST(SUM(k) AS BIGINT) FROM grwz.db.t")
      .head.toSeq == Seq(60L, 1770L))
    spark.sql("CALL grwz.system.compute_table_stats(table => 'db.t')")
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val sk = TableStats.readWithSketches(meta.statistics
      .find(_.snapshotId == meta.currentSnapshotId.get).get.path)
    assert(sk.bank.keySet == Set("{r_id=0}", "{r_id=1}", "{r_id=2}"),
      sk.bank.keySet)
  }

  test("sort/zorder rewrites are partition-scoped too: clustered outputs " +
      "stay partition-pure and bank-visible") {
    val wh = java.nio.file.Files.createTempDirectory("graft-rws").toString
    spark.conf.set("spark.sql.catalog.grws", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grws.warehouse", wh)
    spark.sql("CREATE TABLE grws.db.t (k BIGINT, v BIGINT, r BIGINT) " +
      "PARTITIONED BY (r)")
    spark.sql("INSERT INTO grws.db.t SELECT id, id * 37 % 100, id % 3 FROM RANGE(30)")
    spark.sql("INSERT INTO grws.db.t SELECT id, id * 37 % 100, id % 3 FROM RANGE(30, 60)")
    val dir = s"$wh/db/t"
    // a tiny target forces multiple clustered outputs per partition —
    // each must still hold exactly one partition's rows
    spark.sql("CALL grws.system.rewrite_data_files(table => 'db.t', " +
      "strategy => 'sort', sort_order => 'zorder(k, v)', " +
      "target_file_size_bytes => 2048)")
    val spread = spark.sql(
      "SELECT _file, COUNT(DISTINCT r) AS nr FROM grws.db.t GROUP BY _file")
      .collect()
    assert(spread.forall(_.getLong(1) == 1L),
      s"a clustered output spanning partitions: ${spread.mkString(";")}")
    assert(spark.sql("SELECT COUNT(*), CAST(SUM(k) AS BIGINT) FROM grws.db.t")
      .head.toSeq == Seq(60L, 1770L))
    // the compacted layout still banks per partition — per-tuple output
    // manifests carried the field-507 summaries through the zorder
    spark.sql("CALL grws.system.compute_table_stats(table => 'db.t')")
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val sk = TableStats.readWithSketches(meta.statistics
      .find(_.snapshotId == meta.currentSnapshotId.get).get.path)
    assert(sk.bank.keySet == Set("{r_id=0}", "{r_id=1}", "{r_id=2}"),
      sk.bank.keySet)
  }

  test("foreign truncated summaries (shared lower, differing upper) never " +
      "tag: compaction routes them untagged and reads stay exact") {
    val wh = java.nio.file.Files.createTempDirectory("graft-rwf").toString
    spark.conf.set("spark.sql.catalog.grwf", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grwf.warehouse", wh)
    spark.sql("CREATE TABLE grwf.db.t (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO grwf.db.t SELECT id, 'abcd1' FROM RANGE(10)")
    spark.sql("INSERT INTO grwf.db.t SELECT id, 'abcd2' FROM RANGE(10, 20)")
    val dir = s"$wh/db/t"
    val meta = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val snap = meta.currentSnapshot.get
    val list = snap.manifestList.get
    val infos = ManifestListReader.read(list).sortBy(_.path)
    assert(infos.size == 2, infos.map(_.path).toString)
    // overwrite the list IN PLACE with the foreign truncated shape a
    // spec-compliant external writer may produce for long string
    // partition values: both manifests' field-507 summaries share the
    // truncated LOWER "abcd" while their rounded-up UPPERS differ —
    // the exact pair a lower-bytes-only grouping key would conflate.
    // Neither summary is tuple-pure (lower != upper), so the tagged
    // per-tuple route must refuse BOTH: no false summary may be
    // stamped on either partition's rewritten rows.
    ManifestListWriter.write(list, infos.map(_.path), snap.snapshotId,
      specIds = infos.map(i => i.path -> i.specId).toMap,
      summaries = infos.map(_.path).zip(Seq("abce", "abcf")).map {
        case (p, up) => p -> Seq(ManifestListWriter.FieldSummary(
          containsNull = false, "abcd".getBytes("UTF-8"), up.getBytes("UTF-8")))
      }.toMap,
      addedSnapshotIds = infos.map(i => i.path -> i.addedSnapshotId).toMap,
      addedCounts = infos.map(i => i.path -> i.addedDataFilesCount).toMap,
      seqNums = infos.map(i => i.path -> i.sequenceNumber).toMap,
      minSeqNums = infos.map(i => i.path -> i.minSequenceNumber).toMap)
    val out = spark.sql(
      "CALL grwf.system.rewrite_data_files(table => 'db.t')").head
    assert(out.getInt(0) == 2, out.toString)
    // every output landed in the PLAIN manifest: no data manifest in the
    // new snapshot claims a pure partition tuple (a stamped summary here
    // would let list-level pruning silently drop the other partition)
    val metaAfter = TableMetadata.parseFile(GraftTable.latestMetadataPath(dir))
    val dataAfter = metaAfter.currentSnapshot.flatMap(_.manifestList).toSeq
      .flatMap(ManifestListReader.read).filter(_.content == 0)
    assert(dataAfter.forall(_.summaries.forall(_.forall(s =>
      s.lower.map(_.toSeq) != s.upper.map(_.toSeq)))),
      dataAfter.map(i => (i.path, i.summaries)).toString)
    // both partitions read back exactly through the compacted layout
    val row = spark.sql("SELECT COUNT(*), CAST(SUM(k) AS BIGINT), " +
      "COUNT(DISTINCT p) FROM grwf.db.t").head
    assert(row.toSeq == Seq(20L, 190L, 2L), row.toString)
    assert(spark.sql("SELECT COUNT(*) FROM grwf.db.t WHERE p = 'abcd2'")
      .head.getLong(0) == 10L)
  }

  test("no-op on an empty selection; unsupported predicates refuse loudly") {
    val wh = java.nio.file.Files.createTempDirectory("graft-rwn").toString
    spark.conf.set("spark.sql.catalog.grwn", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grwn.warehouse", wh)
    spark.sql("CREATE TABLE grwn.db.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO grwn.db.t SELECT id, CONCAT('a', id) FROM RANGE(10)")
    val dir = s"$wh/db/t"
    val versionBefore = GraftTable.latestMetadataPath(dir)
    val out = spark.sql("CALL grwn.system.rewrite_data_files(" +
      "table => 'db.t', where => 'k > 1000')").head
    assert(out.getInt(0) == 0 && out.getInt(1) == 0,
      s"an empty selection rewrites and adds nothing: $out")
    assert(GraftTable.latestMetadataPath(dir) == versionBefore,
      "an empty selection must not burn a metadata version")
    // explicit NULL arguments are "use the default", never an NPE —
    // defaults select every file, so the rewrite proceeds
    val nNull = liveFiles(dir).size
    val nullOut = spark.sql("CALL grwn.system.rewrite_data_files(" +
      "table => 'db.t', where => CAST(NULL AS STRING), " +
      "min_input_files => CAST(NULL AS INT))").head
    assert(nullOut.getInt(0) == nNull && nullOut.getInt(1) == 1,
      nullOut.toString)
    // the same rule on every defaultable argument — and a zero target
    // size refuses (ceil(bytes/0) must never reach the planner)
    val nullOut2 = spark.sql("CALL grwn.system.rewrite_data_files(" +
      "table => 'db.t', target_file_size_bytes => CAST(NULL AS BIGINT), " +
      "strategy => CAST(NULL AS STRING), sort_order => CAST(NULL AS STRING))").head
    assert(nullOut2.getInt(0) == 1 && nullOut2.getInt(1) == 1,
      nullOut2.toString)
    val eZero = intercept[Exception](spark.sql(
      "CALL grwn.system.rewrite_data_files(table => 'db.t', " +
        "target_file_size_bytes => 0)"))
    assert(Iterator.iterate(eZero: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).flatMap(t => Option(t.getMessage))
      .mkString(" | ").contains("must be positive"), eZero.toString)
    // refusals: computed expressions, OR, unknown columns, unsupported ops
    for (bad <- Seq("k + 1 > 3", "k > 3 OR k < 1", "nope = 1", "k != 3"))
      withClue(bad) {
        val e = intercept[Exception](spark.sql(
          s"""CALL grwn.system.rewrite_data_files(table => 'db.t', where => "$bad")"""))
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).take(8)
          .flatMap(t => Option(t.getMessage)).mkString(" | ")
        assert(msgs.contains("ANDed comparisons"), msgs)
      }
    // conservative direction: a file carrying NO bounds for the filtered
    // column cannot be excluded — it is selected and rewritten
    spark.sql("INSERT INTO grwn.db.t SELECT id, NULL FROM RANGE(10, 12)")
    val pre = fileRanges(dir)
    val aFile = pre.find(_._2._2 < 10).get._1
    val nullFile = pre.find(_._2._1 >= 10).get._1
    spark.sql("CALL grwn.system.rewrite_data_files(" +
      "table => 'db.t', where => \"s = 'zzz'\")")
    val post = liveFiles(dir)
    assert(post.contains(aFile),
      "bounds 'a0'..'a9' provably exclude 'zzz' — the file must carry")
    assert(!post.contains(nullFile),
      "a file with no string bounds must be conservatively rewritten")
    // min_input_files (upstream's fragmentation threshold): fewer
    // matching files than the threshold no-ops — the idempotent nightly
    // sweep must not churn an already-compact range forever
    val n = liveFiles(dir).size
    val versionBefore2 = GraftTable.latestMetadataPath(dir)
    val mif = spark.sql("CALL grwn.system.rewrite_data_files(" +
      s"table => 'db.t', min_input_files => ${n + 1})").head
    assert(mif.getInt(0) == 0 && mif.getInt(1) == 0 &&
      GraftTable.latestMetadataPath(dir) == versionBefore2,
      s"$n files < threshold ${n + 1} must no-op without a metadata version: $mif")
    assert(spark.sql("CALL grwn.system.rewrite_data_files(" +
      s"table => 'db.t', min_input_files => $n)").head.getInt(1) == 1,
      "at the threshold the rewrite proceeds")
    val eMif = intercept[Exception](spark.sql(
      "CALL grwn.system.rewrite_data_files(table => 'db.t', min_input_files => 0)"))
    assert(Iterator.iterate(eMif: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).flatMap(t => Option(t.getMessage))
      .mkString(" | ").contains("min_input_files"), eMif.toString)
  }

  test("typed literals: date bounds select in epoch-day space, columns " +
      "resolve case-insensitively, space mismatches refuse") {
    val wh = java.nio.file.Files.createTempDirectory("graft-rwt").toString
    spark.conf.set("spark.sql.catalog.grwt", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grwt.warehouse", wh)
    spark.sql("CREATE TABLE grwt.db.t (d DATE, k BIGINT, b BOOLEAN)")
    spark.sql("INSERT INTO grwt.db.t SELECT " +
      "DATE_ADD(DATE'2024-01-01', CAST(id AS INT)), id, id % 2 = 0 FROM RANGE(5)")
    spark.sql("INSERT INTO grwt.db.t SELECT " +
      "DATE_ADD(DATE'2024-06-01', CAST(id AS INT)), id, id % 2 = 0 FROM RANGE(5)")
    val dir = s"$wh/db/t"
    val byMonth = spark.read.format("graft-table")
      .option("metadata", GraftTable.latestMetadataPath(dir)).load()
      .groupBy(col("_file")).agg(min(col("d")).as("lo")).collect()
      .map(r => norm(r.getString(0)) -> r.getDate(1).toLocalDate).toMap
    val june = byMonth.filter(_._2.getMonthValue == 6).keys.toSet
    val january = byMonth.keySet -- june
    assert(june.nonEmpty && january.nonEmpty, byMonth.toString)
    // a string literal on a DATE column would NEVER exclude (different
    // comparison spaces) — silently compacting the whole table where the
    // user asked for January; it must refuse instead
    // cross-UNIT temporal literals are the insidious case: a DATE
    // literal (epoch days) against micro/nano bounds — or a TIMESTAMP
    // literal against day bounds — is "a number vs a number" yet off by
    // 11 orders of magnitude; every combination must refuse
    for (bad <- Seq(
        "d < '2024-02-01'", // string vs DATE bounds
        "d < TIMESTAMP '2024-02-01 00:00:00'", // micros vs day bounds
        "k = DATE '2024-01-01'", // days vs plain-number bounds
        "d < 19800")) // plain number vs day bounds
      withClue(bad) {
        val e = intercept[Exception](spark.sql("CALL grwt.system." +
          s"""rewrite_data_files(table => 'db.t', where => "$bad")"""))
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).take(8)
          .flatMap(t => Option(t.getMessage)).mkString(" | ")
        assert(msgs.contains("typed literal"), msgs)
      }
    // a column NO literal can order against gets the honest diagnostic,
    // not a literal-spelling suggestion that can never succeed
    val eb = intercept[Exception](spark.sql("CALL grwt.system." +
      "rewrite_data_files(table => 'db.t', where => 'b = true')"))
    val ebMsgs = Iterator.iterate(eb: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(ebMsgs.contains("no orderable bound space") &&
      !ebMsgs.contains("typed literal"), ebMsgs)
    // the June files are garbage on disk: a January-scoped rewrite with
    // a PROPER date literal — through an UPPERCASE identifier, resolved
    // case-insensitively like any Spark SQL name — never opens them
    june.foreach(corrupt)
    spark.sql("CALL grwt.system.rewrite_data_files(" +
      "table => 'db.t', where => \"D < DATE '2024-02-01'\")")
    val after = liveFiles(dir)
    assert(after.intersect(june) == june, "June files must carry verbatim")
    assert(after.intersect(january).isEmpty, "January files must be replaced")
  }
}
