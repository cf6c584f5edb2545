package graft.cli

import java.io.{InputStream, PrintStream}

import org.apache.spark.sql.SparkSession

import graft.iceberg.{MetadataTables, TableMetadata}

/** `metadata2json`: print a metadata TABLE of an Iceberg table as JSON —
  * the engine-side companion to `manifest2json`. The reference registers
  * only the manifest tool (Main.java:36); this tool exposes the rest of
  * the metadata document (snapshots / history / refs, the surface
  * MetadataTables serves as DataFrames) through the same Tool SPI and
  * the same `[ , ]` JSON framing (always-valid JSON — the reference's
  * trailing-comma quirk stays fixed, see ManifestToJsonTool).
  *
  * Usage: metadata2json [--table snapshots|history|refs] [--pretty]
  *        <metadata.json>
  */
class MetadataToJsonTool extends Tool {
  override def name: String = "metadata2json"
  override def shortDescription: String =
    "Dumps an Iceberg metadata table (snapshots/history/refs) as JSON"

  override def run(spark: SparkSession, in: InputStream, out: PrintStream,
      err: PrintStream, args: Seq[String]): Int =
    try runChecked(spark, out, err, args)
    catch {
      case e: Exception =>
        err.println(s"metadata2json: ${e.getMessage}")
        1
    }

  private def runChecked(spark: SparkSession, out: PrintStream,
      err: PrintStream, args: Seq[String]): Int = {
    var table = "snapshots"
    var pretty = false
    val positional = scala.collection.mutable.Buffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--pretty" => pretty = true
        case "--table" => i += 1; table = args.lift(i).getOrElse("")
        case t if t.startsWith("--table=") => table = t.drop("--table=".length)
        case other => positional += other
      }
      i += 1
    }
    if (positional.size != 1) {
      err.println("Usage: metadata2json [--table snapshots|history|refs] [--pretty] <metadata.json>")
      return 1
    }
    val meta = TableMetadata.parseFile(positional.head)
    val df = table match {
      case "snapshots" => MetadataTables.snapshots(spark, meta)
      case "history" => MetadataTables.history(spark, meta)
      case "refs" => MetadataTables.refs(spark, meta)
      case other =>
        err.println(s"Unknown metadata table: '$other' (snapshots|history|refs)")
        return 1
    }
    // driver-side stdout sink, same boundary as the reference's print loop
    val rows = df.toJSON.collect()
    val body =
      if (pretty) {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        rows.map(r => om.writerWithDefaultPrettyPrinter()
          .writeValueAsString(om.readTree(r)))
      } else rows
    out.println(body.mkString("[", ",\n", "]"))
    0
  }
}
