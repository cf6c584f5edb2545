package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev utility (r22): per-micro-batch duration breakdown for the streaming
  * entries — the verdict-#3 profile of where the st-family per-entry floor
  * goes (query start vs state-store commit vs memory-sink round trip).
  * A StreamingQueryListener captures every progress event's durationMs map
  * and state-operator commit times; each entry runs twice (warm + timed)
  * and the timed run's breakdown prints alongside total wall seconds.
  *
  * Run: `sbt "Test/runMain graft.R22StreamProbe [dir] [entry ...]"`.
  */
object R22StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(1).toSet
    val spark = Sessions.local("r22streamprobe", "32")
    val progress = ArrayBuffer.empty[String]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        val p = e.progress
        val dur = p.durationMs.asScala.toSeq.sortBy(-_._2.longValue)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        val st = p.stateOperators.toSeq.map(s =>
          s"op=${s.operatorName} commitMs=${s.commitTimeMs} rows=${s.numRowsTotal} " +
            s"mem=${s.memoryUsedBytes}").mkString(" | ")
        progress += s"  batch=${p.batchId} rows=${p.numInputRows} $dur${if (st.nonEmpty) s"\n    $st" else ""}"
      }
    })
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith("st"))
      .filter(n => only.isEmpty || only.exists(o => n.startsWith(o)))
    names.foreach { name =>
      try {
        SparkEntry.queries(name)(spark, dir).count() // warm
        progress.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a beat before printing
        Thread.sleep(300)
        println(f"STREAM $name total=$sec%5.2f s")
        progress.foreach(println)
      } catch {
        case t: Throwable => println(s"STREAM $name ERROR ${t.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
