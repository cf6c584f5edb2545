package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Branch-scoped DELETE (WAP beyond appends): the predicate scans the
  * BRANCH head, the delete snapshot chains from it carrying its
  * manifests, and only the branch ref moves — main stays untouched
  * until fast_forward publishes. Covered for v2 (position-delete
  * parquet) and v3 (deletion vectors, incl. DV merge on the branch). */
class BranchDmlSpec extends SparkSpec {

  private def mkCatalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-$name").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  test("v2: DELETE on a branch stages; main unaffected; publish lands it") {
    mkCatalog("bdl")
    spark.sql("CREATE TABLE bdl.db.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO bdl.db.t SELECT id, concat('v', id) FROM range(0, 20)")
    spark.sql("CALL bdl.system.create_branch(table => 'db.t', branch => 'audit')")
    // stage an append AND a delete on the branch
    spark.sql("INSERT INTO bdl.db.t.branch_audit " +
      "SELECT id, concat('w', id) FROM range(100, 105)")
    spark.sql("DELETE FROM bdl.db.t.branch_audit WHERE k < 5 OR k = 103")
    // branch sees both effects; the delete addressed BRANCH-only rows
    // (k=103 exists only on the branch), proving a branch-head scan
    assert(spark.sql("SELECT count(*), sum(k) FROM bdl.db.t.branch_audit")
      .head() == Row(19L, 190L + 510L - 10L - 103L))
    // main is untouched
    assert(spark.sql("SELECT count(*), sum(k) FROM bdl.db.t").head() ==
      Row(20L, 190L))
    // publish
    spark.sql("CALL bdl.system.fast_forward('db.t', 'audit')")
    assert(spark.sql("SELECT count(*) FROM bdl.db.t").head() == Row(19L))
    assert(spark.sql("SELECT min(k) FROM bdl.db.t").head() == Row(5L))
  }

  test("v3: branch DELETE writes DVs and merges the branch's own DV state") {
    mkCatalog("bdv")
    spark.sql("CREATE TABLE bdv.db.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('format-version'='3', 'commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO bdv.db.t SELECT id, concat('v', id) FROM range(0, 20)")
    spark.sql("CALL bdv.system.create_branch(table => 'db.t', branch => 'stage')")
    // two deletes on the same branch: the second must MERGE the first's
    // deletion vectors (at most one live DV per file on the branch head)
    spark.sql("DELETE FROM bdv.db.t.branch_stage WHERE k < 3")
    spark.sql("DELETE FROM bdv.db.t.branch_stage WHERE k >= 17")
    assert(spark.sql("SELECT count(*), min(k), max(k) FROM bdv.db.t.branch_stage")
      .head() == Row(14L, 3L, 16L))
    assert(spark.sql("SELECT count(*) FROM bdv.db.t").head() == Row(20L))
    spark.sql("CALL bdv.system.fast_forward('db.t', 'stage')")
    assert(spark.sql("SELECT count(*), min(k), max(k) FROM bdv.db.t")
      .head() == Row(14L, 3L, 16L))
  }

  test("branch writes preserve the ref's retention attributes") {
    val wh = mkCatalog("brt")
    spark.sql("CREATE TABLE brt.db.t (k BIGINT) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO brt.db.t SELECT id FROM range(0, 5)")
    spark.sql("CALL brt.system.create_branch(table => 'db.t', branch => 'b', " +
      "min_snapshots_to_keep => 3, max_ref_age_ms => 123456789)")
    // an append AND a delete through the branch identifier both MOVE the
    // ref; neither may rebuild it bare (reverting i90 retention would
    // flip expiry from the declared policy back to pin-forever)
    spark.sql("INSERT INTO brt.db.t.branch_b VALUES (100)")
    spark.sql("DELETE FROM brt.db.t.branch_b WHERE k = 0")
    val meta = graft.iceberg.TableMetadata.parseFile(
      graft.iceberg.GraftTable.latestMetadataPath(s"$wh/db/t"))
    val ref = meta.refs.find(_.name == "b").get
    assert(ref.minSnapshotsToKeep.contains(3) &&
      ref.maxRefAgeMs.contains(123456789L), ref.toString)
  }

  test("branch DELETE refuses unknown branches; branch UPDATE stages (COW)") {
    mkCatalog("bde")
    spark.sql("CREATE TABLE bde.db.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO bde.db.t SELECT id, concat('v', id) FROM range(0, 5)")
    intercept[Exception](
      spark.sql("DELETE FROM bde.db.t.branch_nope WHERE k = 1"))
    spark.sql("CALL bde.system.create_branch(table => 'db.t', branch => 'b')")
    // round 16: UPDATE through the branch identifier is BRANCH-SCOPED —
    // the edit lands on the branch head, main stays pristine
    spark.sql("UPDATE bde.db.t.branch_b SET v = 'x' WHERE k = 1")
    assert(spark.sql("SELECT v FROM bde.db.t.branch_b WHERE k = 1").head() ==
      Row("x"))
    assert(spark.sql("SELECT v FROM bde.db.t WHERE k = 1").head() == Row("v1"))
    // the pushed-predicate DELETE composes with the staged edit
    spark.sql("DELETE FROM bde.db.t.branch_b WHERE k = 0")
    assert(spark.sql("SELECT count(*) FROM bde.db.t.branch_b").head() == Row(4L))
    assert(spark.sql("SELECT count(*) FROM bde.db.t").head() == Row(5L))
  }

  test("branch MERGE (COW) edits branch-only rows; fast_forward publishes") {
    mkCatalog("bme")
    spark.sql("CREATE TABLE bme.db.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO bme.db.t SELECT id, concat('v', id) FROM range(0, 5)")
    spark.sql("CALL bme.system.create_branch(table => 'db.t', branch => 'b')")
    // stage an append so the MERGE's matched set spans base AND staged
    // rows — only a branch-head scan can match k=100
    spark.sql("INSERT INTO bme.db.t.branch_b VALUES (100, 'w100')")
    spark.sql("""MERGE INTO bme.db.t.branch_b t
      USING (SELECT * FROM VALUES (1L, 'm1'), (100L, 'm100'), (200L, 'm200')
             AS s(k, v)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(spark.sql(
      "SELECT count(*), count(CASE WHEN v LIKE 'm%' THEN 1 END) " +
        "FROM bme.db.t.branch_b").head() == Row(7L, 3L))
    // main: no staged row, no edit
    assert(spark.sql(
      "SELECT count(*), count(CASE WHEN v LIKE 'm%' THEN 1 END) " +
        "FROM bme.db.t").head() == Row(5L, 0L))
    spark.sql("CALL bme.system.fast_forward('db.t', 'b')")
    assert(spark.sql("SELECT v FROM bme.db.t WHERE k = 100").head() == Row("m100"))
    assert(spark.sql("SELECT count(*) FROM bme.db.t").head() == Row(7L))
  }

  test("v3 MOR: branch UPDATE lands delta state scoped to the branch") {
    val wh = mkCatalog("bmu")
    spark.sql("CREATE TABLE bmu.db.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('format-version'='3', " +
      "'write.update.mode'='merge-on-read', " +
      "'commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO bmu.db.t SELECT id, concat('v', id) FROM range(0, 10)")
    spark.sql("CALL bmu.system.create_branch(table => 'db.t', branch => 'b')")
    // a branch DELETE first, so the UPDATE's deletion vectors must MERGE
    // the branch's own pending DV state (not main's)
    spark.sql("DELETE FROM bmu.db.t.branch_b WHERE k < 2")
    spark.sql("UPDATE bmu.db.t.branch_b SET v = 'u' WHERE k >= 8")
    assert(spark.sql(
      "SELECT count(*), count(CASE WHEN v = 'u' THEN 1 END) " +
        "FROM bmu.db.t.branch_b").head() == Row(8L, 2L))
    // main unaffected by the delete AND the update
    assert(spark.sql(
      "SELECT count(*), count(CASE WHEN v = 'u' THEN 1 END) " +
        "FROM bmu.db.t").head() == Row(10L, 0L))
    // the branch head's delta state: DVs (or eq/pos deletes) live on the
    // BRANCH ref only
    val meta = graft.iceberg.TableMetadata.parseFile(
      graft.iceberg.GraftTable.latestMetadataPath(s"$wh/db/t"))
    val branchHead = meta.snapshots
      .find(s => meta.refs.exists(r => r.name == "b" && r.snapshotId == s.snapshotId))
      .getOrElse(fail("branch ref lost"))
    assert(branchHead.summary.get("added-delete-files").exists(_.toInt > 0) ||
      branchHead.summary.get("added-dvs").exists(_.toInt > 0),
      s"branch head carries no delta delete state: ${branchHead.summary}")
    spark.sql("CALL bmu.system.fast_forward('db.t', 'b')")
    assert(spark.sql(
      "SELECT count(*), count(CASE WHEN v = 'u' THEN 1 END) FROM bmu.db.t")
      .head() == Row(8L, 2L))
  }
}
