package graft.cli

import java.io.PrintStream

import scala.collection.immutable.TreeMap

import org.apache.spark.sql.SparkSession

import graft.Sessions

/** CLI driver — tool registry + dispatch, parity with the reference's Main
  * (/root/reference/src/main/java/dev/liliwei/iceberg/tool/Main.java:34-80):
  * first argv token selects a tool from a sorted registry; empty/unknown
  * prints a version banner + tool listing and exits 1.
  */
object Main {

  /** Classpath resource as a string (VERSION.txt / META-INF/NOTICE —
    * banner parity with Main.java:62-71). */
  private def resource(name: String): Option[String] =
    Option(getClass.getClassLoader.getResourceAsStream(name)).map { in =>
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }

  val version: String = resource("VERSION.txt").map(_.trim).getOrElse("0.1.0")

  /** First 5 NOTICE lines, like the reference's printHead(noticeInput, 5). */
  private def noticeHead: Seq[String] =
    resource("META-INF/NOTICE").toSeq.flatMap(_.linesIterator.take(5))

  def tools: TreeMap[String, Tool] =
    TreeMap(Seq[Tool](new ManifestToJsonTool, new MetadataToJsonTool)
      .map(t => t.name -> t): _*)

  def run(spark: SparkSession, out: PrintStream, err: PrintStream, args: Seq[String]): Int =
    args.headOption.flatMap(tools.get) match {
      case Some(tool) => tool.run(spark, System.in, out, err, args.tail)
      case None =>
        val head = noticeHead
        if (head.isEmpty)
          // shaded deployments may strip META-INF — keep a complete line
          err.println(s"Version $version of graft iceberg-tools (Spark-native)")
        else {
          err.print(s"Version $version of ")
          head.foreach(err.println)
        }
        err.println("----------------")
        err.println("Available tools:")
        tools.values.foreach(t => err.println(f"  ${t.name}%-18s ${t.shortDescription}"))
        1
    }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-cli")
    try sys.exit(run(spark, System.out, System.err, args.toSeq))
    finally spark.stop()
  }
}
