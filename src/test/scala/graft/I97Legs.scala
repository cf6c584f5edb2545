package graft

import org.apache.spark.sql.functions._

import graft.iceberg._

/** Dev utility (test scope): per-leg timing of the i97 lifecycle entry —
  * the attribution harness the r19 verdict asked for (i97 drifted 2→3 s
  * and the round's batched-bank ANALYZE code sits on one of its legs).
  * Replays the entry's exact legs (create → append → MOR delete →
  * ANALYZE → dry-run → delete) N passes and prints per-leg seconds, so a
  * drift pins to a LEG instead of a whole-entry guess.
  * Run: `sbt "Test/runMain graft.I97Legs [passes]"`. */
object I97Legs {

  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.local("graft-i97legs", cores = "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.conf.set("spark.sql.catalog.graft_drf",
      classOf[graft.sources.GraftCatalog].getName)
    val legs = Seq("create", "append", "mor_delete", "analyze", "dry_run",
      "delete_reachable", "leftover_sweep")
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (pass <- 0 until passes) {
      val root = java.nio.file.Files.createTempDirectory("graft-i97legs").toString
      val dir = s"$root/db/t"
      spark.conf.set("spark.sql.catalog.graft_drf.warehouse", root)
      def leg[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        acc(name) ::= (System.nanoTime() - t0) / 1e9
        r
      }
      leg("create")(GraftTable.create(dir, IcebergSchema(0, Seq(
        IcebergField(1, "n_nationkey", required = false, "int"),
        IcebergField(2, "n_name", required = false, "string"),
        IcebergField(3, "n_regionkey", required = false, "int"))),
        tableUuid = "b6b9a6a1-0000-4000-8000-000000000097",
        timestampMs = 1700000000000L))
      leg("append")(GraftTable.append(spark, dir,
        Tables.load(spark, sfDir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))))
      leg("mor_delete")(GraftTable.deleteWhere(spark, dir, col("n_nationkey") >= 20))
      leg("analyze")(GraftTable.computeTableStats(spark, dir))
      val metaFile = GraftTable.latestMetadataPath(dir)
      leg("dry_run")(spark.sql(s"""CALL graft_drf.system.delete_reachable_files(
        metadata_file => '$metaFile', dry_run => true)""").head())
      leg("delete_reachable")(spark.sql(s"""CALL graft_drf.system.delete_reachable_files(
        metadata_file => '$metaFile')""").head())
      leg("leftover_sweep") {
        val fs = HadoopConfs.fileSystemFor(root)
        val p = new org.apache.hadoop.fs.Path(dir)
        if (fs.exists(p)) {
          val it = fs.listFiles(p, true)
          var n = 0
          while (it.hasNext) { it.next(); n += 1 }
          n
        } else 0
      }
    }
    println(f"[i97legs] per-leg seconds over $passes passes (first=warmup):")
    legs.foreach { l =>
      val ts = acc(l).reverse
      println(f"[i97legs]   $l%-17s ${ts.map(t => f"$t%6.3f").mkString(" ")}  " +
        f"min=${ts.drop(1).minOption.getOrElse(ts.head)}%6.3f")
    }
    val totals = (0 until passes).map(i => legs.map(l => acc(l).reverse(i)).sum)
    println(f"[i97legs] totals: ${totals.map(t => f"$t%6.3f").mkString(" ")}")
    spark.stop()
  }
}
