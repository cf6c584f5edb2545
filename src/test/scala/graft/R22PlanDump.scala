package graft

/** Dev utility (test scope) for the round-22 optimization evidence:
  * dumps `.explain("formatted")` for the named entries into
  * `plans/r22/<entry>_<suffix>.txt` — the before/after plan record the
  * optimization round's judge checks claims against.
  *
  * Run: `sbt "Test/runMain graft.R22PlanDump before s07_kmeans_train ..."`
  * (first arg is the suffix, rest are entry names; default data dir
  * sf0.01 to match PLANS.md, override with SPARK_GRAFT_SF_DIR).
  */
object R22PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R22PlanDump <suffix> <entry> [entry ...]")
    val suffix = args.head
    val names = args.tail.toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local("graft-r22-plandump", cores = "4")
    val outDir = java.nio.file.Paths.get("plans", "r22")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      // materialize first so AQE finalizes: runtime decisions (broadcast
      // from stats, skew splits, stage reuse) are part of the evidence
      df.collect()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val p = outDir.resolve(s"${name}_$suffix.txt")
      java.nio.file.Files.writeString(p,
        s"# $name — explain(formatted), $dir, ${spark.sparkContext.master}\n$formatted")
      println(s"[r22plans] wrote $p")
    }
    spark.stop()
  }
}
