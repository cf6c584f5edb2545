package graft.iceberg

import com.fasterxml.jackson.databind.ObjectMapper

/** Table-statistics documents: per-column NDV + null counts committed by
  * `compute_table_stats` (ANALYZE) into the metadata `statistics` list
  * and served back to Spark's CBO through the DSv2 Statistics surface.
  *
  * The on-disk container is a spec-layout PUFFIN file (see [[Puffin]])
  * with one `graft-ndv-v1` blob per column — a custom blob-type name so
  * a foreign Puffin reader SKIPS it rather than misparse a sketch this
  * engine does not produce; ndv/null-count ride in the blob properties
  * (the body repeats them as a small JSON document). */
object TableStats {

  final case class ColumnStats(ndv: Long, nullCount: Long)
  final case class Doc(snapshotId: Long, rowCount: Long, columns: Map[Int, ColumnStats])

  private val mapper = new ObjectMapper()

  def write(path: String, doc: Doc): Long = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val blobs = doc.columns.toSeq.sortBy(_._1).map { case (fieldId, cs) =>
      val b = mapper.createObjectNode()
      b.put("ndv", cs.ndv)
      b.put("null-count", cs.nullCount)
      Puffin.Blob("graft-ndv-v1", Seq(fieldId), doc.snapshotId, doc.snapshotId,
        Map("ndv" -> cs.ndv.toString, "null-count" -> cs.nullCount.toString),
        b.toString.getBytes(utf8))
    }
    val (_, size) = Puffin.write(path, blobs, Map(
      "snapshot-id" -> doc.snapshotId.toString,
      "row-count" -> doc.rowCount.toString))
    size
  }

  def read(path: String): Doc = {
    val (_, refs, props) = Puffin.read(path)
    val columns = refs.filter(_.blobType == "graft-ndv-v1").map { r =>
      r.fields.head -> ColumnStats(
        r.properties("ndv").toLong, r.properties("null-count").toLong)
    }.toMap
    Doc(props("snapshot-id").toLong, props("row-count").toLong, columns)
  }
}
