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

  test("branch DELETE refuses unknown branches; UPDATE on a branch refuses") {
    mkCatalog("bde")
    spark.sql("CREATE TABLE bde.db.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')")
    spark.sql("INSERT INTO bde.db.t SELECT id, concat('v', id) FROM range(0, 5)")
    intercept[Exception](
      spark.sql("DELETE FROM bde.db.t.branch_nope WHERE k = 1"))
    spark.sql("CALL bde.system.create_branch(table => 'db.t', branch => 'b')")
    // row-level operations are not branch-scoped — they must refuse, not
    // silently hit main
    val e = intercept[Exception](
      spark.sql("UPDATE bde.db.t.branch_b SET v = 'x' WHERE k = 1"))
    assert(e.getMessage.contains("branch"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM bde.db.t").head() == Row(5L))
    // the supported pushed-predicate DELETE still works after the refusal
    spark.sql("DELETE FROM bde.db.t.branch_b WHERE k = 0")
    assert(spark.sql("SELECT count(*) FROM bde.db.t.branch_b").head() == Row(4L))
    assert(spark.sql("SELECT count(*) FROM bde.db.t").head() == Row(5L))
  }
}
