package graft.iceberg

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.iceberg.IcebergTypes._

/** Codec battery: the reference wires snappy/xz/zstd Avro codecs
  * (/root/reference/pom.xml:52-67); our writers must produce containers in
  * each that our readers (codec-transparent — the container header names
  * the codec) round-trip exactly. */
class ManifestCodecSpec extends SparkSpec {

  private val codecs = Seq("null", "deflate", "snappy", "zstandard")

  private def headerCodec(path: String): String = {
    val in = new java.io.FileInputStream(path)
    val s = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try s.getMetaString("avro.codec") finally { s.close(); in.close() }
  }

  test("manifest containers round-trip through every supported codec") {
    val dir = java.nio.file.Files.createTempDirectory("graft-codec").toString
    val entries = Seq(
      ManifestWriter.EntryData(1, 42L, "data-1.parquet", 10L, 1234L,
        Map(1 -> SingleValueCodec.encode(TLong, 1L)),
        Map(1 -> SingleValueCodec.encode(TLong, 10L))),
      ManifestWriter.EntryData(0, 41L, "data-0.parquet", 7L, 987L,
        Map(1 -> SingleValueCodec.encode(TLong, 11L)),
        Map(1 -> SingleValueCodec.encode(TLong, 20L))))
    codecs.foreach { codec =>
      val p = s"$dir/m-$codec.avro"
      ManifestWriter.write(p, entries, codec)
      assert(Option(headerCodec(p)).getOrElse("null") == codec, s"codec meta for $codec")
      val back = ManifestReader.entries(spark, Seq(p))
        .select(col("status"), col("snapshot_id"), col("data_file.file_path"),
          col("data_file.record_count"), col("data_file.file_size_in_bytes"))
        .orderBy(col("file_path"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      assert(back.toSeq == Seq((0, 41L, "data-0.parquet", 7L, 987L),
        (1, 42L, "data-1.parquet", 10L, 1234L)), s"round-trip for $codec")
    }
  }

  test("manifest-list containers round-trip through every supported codec") {
    val dir = java.nio.file.Files.createTempDirectory("graft-codec-list").toString
    val manifest = s"$dir/m0.avro"
    ManifestWriter.write(manifest, Seq(ManifestWriter.EntryData(
      1, 1L, "f.parquet", 1L, 1L, Map.empty, Map.empty)))
    codecs.foreach { codec =>
      val p = s"$dir/list-$codec.avro"
      ManifestListWriter.write(p, Seq(manifest), snapshotId = 5L, codec = codec)
      assert(Option(headerCodec(p)).getOrElse("null") == codec)
      val back = graft.iceberg.MetadataTables.manifests(spark, p)
        .select(col("manifest_path"), col("added_snapshot_id")).collect()
      assert(back.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq((manifest, 5L)),
        s"list round-trip for $codec")
    }
  }
}
