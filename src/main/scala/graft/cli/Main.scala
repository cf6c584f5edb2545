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
  val version = "0.1.0"

  def tools: TreeMap[String, Tool] =
    TreeMap(Seq[Tool](new ManifestToJsonTool).map(t => t.name -> t): _*)

  def run(spark: SparkSession, out: PrintStream, err: PrintStream, args: Seq[String]): Int =
    args.headOption.flatMap(tools.get) match {
      case Some(tool) => tool.run(spark, System.in, out, err, args.tail)
      case None =>
        err.println(s"Version $version of graft iceberg-tools (Spark-native)")
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
