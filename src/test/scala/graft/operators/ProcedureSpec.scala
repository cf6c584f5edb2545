package graft.operators

import graft.SparkSpec

/** SQL maintenance procedures (`CALL graft.system.<proc>(...)`) through
  * the DSv2 ProcedureCatalog: compaction, tagging, rollback,
  * fast-forward, and snapshot expiry — the full table lifecycle with no
  * programmatic API in sight. */
class ProcedureSpec extends SparkSpec {

  test("CALL procedures drive the whole maintenance lifecycle") {
    val wh = java.nio.file.Files.createTempDirectory("graft-proc").toString
    spark.conf.set("spark.sql.catalog.graft_proc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_proc.warehouse", wh)
    spark.sql("""CREATE TABLE graft_proc.db.t (k BIGINT, v STRING)
      TBLPROPERTIES ('commit-timestamp-ms'='1700000000000')""")
    (1 to 3).foreach(i => spark.sql(
      s"INSERT INTO graft_proc.db.t VALUES ($i, 'v$i'), (${i + 10}, 'w$i')"))

    // discovery: the procedures list under <catalog>.system
    val shown = spark.sql("SHOW PROCEDURES IN graft_proc.system")
      .select("procedure_name").collect().map(_.getString(0)).toSet
    assert(graft.sources.GraftProcedures.names.toSet.subsetOf(shown), shown)

    // rewrite_data_files: the per-task insert files bin-pack into 1
    // (named-arg syntax)
    val rw = spark.sql(
      "CALL graft_proc.system.rewrite_data_files(table => 'db.t')").collect()
    assert(rw.length == 1)
    assert(rw.head.getInt(0) == 6 && rw.head.getInt(1) == 1, rw.head.toString)
    val compactedSnap = rw.head.getLong(2)
    assert(spark.sql("SELECT COUNT(*) FROM graft_proc.db.t").head.getLong(0) == 6L)

    // create_tag with no snapshot_id tags the current (compacted) head
    val tg = spark.sql(
      "CALL graft_proc.system.create_tag('db.t', 'compacted')").collect()
    assert(tg.head.getString(0) == "compacted" && tg.head.getLong(1) == compactedSnap)

    // rollback_to_snapshot: main moves back to the pre-compaction head;
    // content is identical (compaction rewrites bytes, not rows)
    val rb = spark.sql(
      s"CALL graft_proc.system.rollback_to_snapshot('db.t', ${compactedSnap - 1})")
      .collect()
    assert(rb.head.getLong(0) == compactedSnap &&
      rb.head.getLong(1) == compactedSnap - 1)
    assert(spark.sql("SELECT COUNT(*) FROM graft_proc.db.t").head.getLong(0) == 6L)

    // fast_forward publishes main back onto the tagged snapshot (it
    // descends from the rolled-back head)
    val ff = spark.sql(
      "CALL graft_proc.system.fast_forward('db.t', 'compacted')").collect()
    assert(ff.head.getLong(0) == compactedSnap - 1 &&
      ff.head.getLong(1) == compactedSnap)

    // ancestors_of: the parent chain, newest first — the head descends
    // through the compaction to the three appends and the create commit
    val anc = spark.sql("CALL graft_proc.system.ancestors_of('db.t')").collect()
    assert(anc.map(_.getLong(0)).toSeq == (compactedSnap to 1L by -1L).toSeq,
      anc.mkString(", "))
    val ancAt = spark.sql(
      s"CALL graft_proc.system.ancestors_of('db.t', ${compactedSnap - 2})").collect()
    assert(ancAt.map(_.getLong(0)).toSeq == (compactedSnap - 2 to 1L by -1L).toSeq)

    // expire_snapshots: keep the last 2 of 4; the survivors still read
    val ex = spark.sql(
      "CALL graft_proc.system.expire_snapshots('db.t', 2)").collect()
    assert(ex.head.getInt(0) == 2 && ex.head.getInt(1) == 2, ex.head.toString)
    val live = spark.sql("SELECT k FROM graft_proc.db.t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(live == Seq(1L, 2L, 3L, 11L, 12L, 13L))

    // an unknown procedure name fails to resolve (Spark wraps the
    // catalog's message, which lists the available procedures, in
    // FAILED_TO_LOAD_ROUTINE)
    val err = intercept[Exception](
      spark.sql("CALL graft_proc.system.nope('db.t')"))
    val messages = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("; ")
    assert(messages.contains("nope"), messages)
  }
}
