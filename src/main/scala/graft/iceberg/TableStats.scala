package graft.iceberg

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** Table-level statistics blob, referenced from the metadata document's
  * `statistics` list (the spec's Puffin file slot). The CONTENT here is
  * JSON rather than Puffin's binary container — same information (per-
  * field NDV + null counts + row count, all keyed by FIELD ID so renames
  * don't orphan them), radically simpler to audit, and a documented
  * deviation: a foreign reader sees a statistics entry it cannot decode
  * and ignores it, exactly as Iceberg readers treat unknown blob types. */
object TableStats {

  final case class ColumnStats(ndv: Long, nullCount: Long)
  final case class Doc(snapshotId: Long, rowCount: Long, columns: Map[Int, ColumnStats])

  private val mapper = new ObjectMapper()

  /** Writes the blob; returns its size in bytes (the metadata entry's
    * file-size-in-bytes). */
  def write(path: String, doc: Doc): Long = {
    val root = mapper.createObjectNode()
    root.put("snapshot-id", doc.snapshotId)
    root.put("row-count", doc.rowCount)
    val cols = root.putObject("columns")
    doc.columns.toSeq.sortBy(_._1).foreach { case (fieldId, cs) =>
      val n = cols.putObject(fieldId.toString)
      n.put("ndv", cs.ndv)
      n.put("null-count", cs.nullCount)
    }
    val bytes = root.toPrettyString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = HadoopConfs.fileSystemFor(path)
      .create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(bytes) finally out.close()
    bytes.length.toLong
  }

  def read(path: String): Doc = {
    val in = HadoopConfs.fileSystemFor(path).open(new org.apache.hadoop.fs.Path(path))
    val root = try mapper.readTree(in) finally in.close()
    Doc(
      root.get("snapshot-id").asLong,
      root.get("row-count").asLong,
      Option(root.get("columns")).map(_.properties().asScala.map { e =>
        e.getKey.toInt -> ColumnStats(
          e.getValue.get("ndv").asLong, e.getValue.get("null-count").asLong)
      }.toMap).getOrElse(Map.empty))
  }
}
