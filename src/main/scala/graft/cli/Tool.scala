package graft.cli

import java.io.{InputStream, PrintStream}

import org.apache.spark.sql.SparkSession

/** Tool SPI — parity with the reference's interface
  * (/root/reference/src/main/java/dev/liliwei/iceberg/tool/Tool.java:28-47):
  * injected streams for testability, plus an injected SparkSession (our
  * engine's execution context).
  */
trait Tool {
  /** @return exit code */
  def run(spark: SparkSession, in: InputStream, out: PrintStream, err: PrintStream,
      args: Seq[String]): Int
  def name: String
  def shortDescription: String
}
