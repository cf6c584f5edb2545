package graft.iceberg

import java.nio.{ByteBuffer, ByteOrder}

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** Table-level statistics as a PUFFIN file (the Iceberg statistics
  * container the metadata `statistics` list references):
  *
  * {{{
  *   Magic | blob₁ … blobₙ | Magic | FooterPayload(JSON) |
  *     FooterPayloadSize(i32 LE) | Flags(i32 LE) | Magic
  * }}}
  *
  * with Magic = "PFA1". One blob per analyzed column, blob type
  * `graft-ndv-v1`: the NDV and null count ride in the blob's footer
  * `properties` (the same convention Iceberg's own
  * `apache-datasketches-theta-v1` blobs use for the `ndv` property — the
  * consumer reads the property, not the sketch), and the blob BODY is
  * the same JSON so the file is self-contained. A custom type name is
  * deliberate: this engine does not produce theta sketches, and a
  * foreign reader must skip unknown blob types per the Puffin spec
  * rather than deserialize a body that is not what the type promises.
  * Row count and the analyzed snapshot ride in the file-level
  * properties. Uncompressed (flags = 0). */
object TableStats {

  final case class ColumnStats(ndv: Long, nullCount: Long)
  final case class Doc(snapshotId: Long, rowCount: Long, columns: Map[Int, ColumnStats])

  private val mapper = new ObjectMapper()
  private val Magic = Array[Byte]('P', 'F', 'A', '1')

  /** Writes the Puffin file; returns its size in bytes (the metadata
    * entry's file-size-in-bytes). */
  def write(path: String, doc: Doc): Long = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    // blob bodies first — the footer needs their offsets
    val bodies = doc.columns.toSeq.sortBy(_._1).map { case (fieldId, cs) =>
      val b = mapper.createObjectNode()
      b.put("ndv", cs.ndv)
      b.put("null-count", cs.nullCount)
      (fieldId, cs, b.toString.getBytes(utf8))
    }
    val blobsMeta = mapper.createArrayNode()
    var offset = Magic.length.toLong
    bodies.foreach { case (fieldId, cs, body) =>
      val m = mapper.createObjectNode()
      m.put("type", "graft-ndv-v1")
      m.putArray("fields").add(fieldId)
      m.put("snapshot-id", doc.snapshotId)
      m.put("sequence-number", doc.snapshotId)
      m.put("offset", offset)
      m.put("length", body.length.toLong)
      val props = m.putObject("properties")
      props.put("ndv", cs.ndv.toString)
      props.put("null-count", cs.nullCount.toString)
      blobsMeta.add(m)
      offset += body.length
    }
    val footer = mapper.createObjectNode()
    footer.set[com.fasterxml.jackson.databind.JsonNode]("blobs", blobsMeta)
    val fileProps = footer.putObject("properties")
    fileProps.put("created-by", "graft")
    fileProps.put("snapshot-id", doc.snapshotId.toString)
    fileProps.put("row-count", doc.rowCount.toString)
    val payload = footer.toString.getBytes(utf8)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(payload.length).putInt(0).array()
    val out = HadoopConfs.fileSystemFor(path)
      .create(new org.apache.hadoop.fs.Path(path), true)
    var size = 0L
    def emit(b: Array[Byte]): Unit = { out.write(b); size += b.length }
    try {
      emit(Magic)
      bodies.foreach { case (_, _, body) => emit(body) }
      emit(Magic); emit(payload); emit(tail); emit(Magic)
    } finally out.close()
    size
  }

  def read(path: String): Doc = {
    val fs = HadoopConfs.fileSystemFor(path)
    val p = new org.apache.hadoop.fs.Path(path)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    val bytes = try {
      val buf = new Array[Byte]((len min Int.MaxValue.toLong).toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
    require(bytes.length >= 16 &&
      bytes.take(4).sameElements(Magic) && bytes.takeRight(4).sameElements(Magic),
      s"$path is not a Puffin file")
    val payloadSize = ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    val payload = java.util.Arrays.copyOfRange(
      bytes, bytes.length - 12 - payloadSize, bytes.length - 12)
    val footer = mapper.readTree(
      new String(payload, java.nio.charset.StandardCharsets.UTF_8))
    val props = footer.get("properties")
    val columns = Option(footer.get("blobs")).toSeq
      .flatMap(_.elements().asScala)
      .filter(b => b.get("type").asText == "graft-ndv-v1")
      .map { b =>
        val fieldId = b.get("fields").elements().asScala.next().asInt
        val bp = b.get("properties")
        fieldId -> ColumnStats(
          bp.get("ndv").asText.toLong, bp.get("null-count").asText.toLong)
      }.toMap
    Doc(
      props.get("snapshot-id").asText.toLong,
      props.get("row-count").asText.toLong,
      columns)
  }
}
