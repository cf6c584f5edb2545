package graft

/** Dev utility (r21, session 2): automated plan audit over ALL entries —
  * executes each declared query at sf0.01 and reports, from the executed
  * (AQE-final) plan: per-parquet-path scan counts, exchange counts and
  * reuse, so multi-scan shapes that the per-family manual audits might
  * miss show up mechanically. Known by-design multi-scan entries are
  * listed in the output like everything else; the reader adjudicates. */
object R21Audit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("r21audit", "8")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        df.collect()
        // keep only the AQE-final section — toString repeats the initial
        // plan below "== Initial Plan ==", which would double every count
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val scanRe = "FileScan \\w+ ".r
        val pathRe = "InMemoryFileIndex(?:\\(\\d+ paths\\))?\\[([^,\\]]+)".r
        val paths = pathRe.findAllMatchIn(plan).map(_.group(1)
          .split('/').takeRight(1).head).toSeq
        val byPath = paths.groupBy(identity).view.mapValues(_.size).toMap
        val dup = byPath.filter(_._2 >= 2)
        val nEx = "(?<!Reused)Exchange".r.findAllIn(plan).size
        val nReuse = "ReusedExchange".r.findAllIn(plan).size
        val nBhj = "BroadcastHashJoin".r.findAllIn(plan).size
        val nSmj = "SortMergeJoin".r.findAllIn(plan).size
        val nNlj = "BroadcastNestedLoopJoin|CartesianProduct".r.findAllIn(plan).size
        val flag = if (dup.nonEmpty || nNlj > 0) " <<" else ""
        println(f"AUDIT $name%-28s scans=${paths.size}%2d dup=${dup.mkString(",")}%-40s ex=$nEx reuse=$nReuse bhj=$nBhj smj=$nSmj nlj=$nNlj$flag")
      } catch {
        case t: Throwable => println(s"AUDIT $name ERROR ${t.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
