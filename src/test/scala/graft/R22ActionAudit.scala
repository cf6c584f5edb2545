package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev utility (r22): SPARK-ACTION audit over the declared entries — the
  * d09-style audit the r21 verdict asked for, but counting JOBS instead of
  * plan nodes. Each entry runs once (collect() as the single terminal
  * action, matching the bench's count()); a SparkListener counts every job
  * the entry's own code launched BEFORE that terminal action (driver-side
  * .head()/.collect()/metadata re-reads inside the operator body). Entries
  * with high pre-action job counts are where redundant action pairs hide.
  *
  * Run: `sbt "Test/runMain graft.R22ActionAudit [dir] [prefix]"` — dumps
  * one line per entry: jobs-in-build (during the Q function call), jobs in
  * the terminal collect, and wall seconds for each phase.
  */
object R22ActionAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val prefix = args.drop(1).headOption.getOrElse("")
    val detail = sys.env.contains("GRAFT_AUDIT_DETAIL")
    val spark = Sessions.local("r22actions", "8")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (detail) {
          import scala.jdk.CollectionConverters._
          val p = j.properties.asScala
          val sqlId = p.getOrElse("spark.sql.execution.id", "-")
          val stage = j.stageInfos.lastOption.map(_.name.linesIterator.next().take(80)).getOrElse("?")
          println(s"  JOB|${j.jobId}|sql=$sqlId|$stage")
        }
        ()
      }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
              if detail =>
            println(s"  SQL|${s.executionId}|${s.description.linesIterator.next().take(120)}")
          case _ => ()
        }
    })
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(_.startsWith(prefix))
    names.foreach { name =>
      try {
        val t0 = System.nanoTime()
        jobs.set(0)
        val df = SparkEntry.queries(name)(spark, dir)
        // listener events are async: a short drain pause is accurate
        // enough for an audit (counts are stable at these job rates)
        Thread.sleep(200)
        val buildJobs = jobs.get()
        val t1 = System.nanoTime()
        df.collect()
        Thread.sleep(200)
        val actJobs = jobs.get() - buildJobs
        val t2 = System.nanoTime()
        println(f"ACTIONS $name%-28s build_jobs=$buildJobs%3d collect_jobs=$actJobs%3d " +
          f"build_s=${(t1 - t0) / 1e9}%6.2f collect_s=${(t2 - t1) / 1e9}%6.2f")
      } catch {
        case t: Throwable => println(s"ACTIONS $name ERROR ${t.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
