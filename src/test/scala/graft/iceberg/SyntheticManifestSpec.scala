package graft.iceberg

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.SparkSpec
import graft.functions.BoundDecode
import graft.iceberg.IcebergTypes._

/** Full-type-lattice coverage for the bound decoder: the golden fixture
  * only exercises long+string bounds, so this spec writes a synthetic
  * manifest-shaped Avro file with date/timestamp/decimal/uuid/double
  * bounds and runs it through the real distributed reader + decoder.
  * Also exercises the multi-file scan path (one task per manifest).
  */
class SyntheticManifestSpec extends SparkSpec {

  private def logicalMapSchema(keyId: Int, valueId: Int): Schema = {
    val kv = SchemaBuilder.record(s"kv$keyId").fields()
      .name("key").prop("field-id", keyId.toString).`type`().intType().noDefault()
      .name("value").prop("field-id", valueId.toString).`type`().bytesType().noDefault()
      .endRecord()
    val arr = Schema.createArray(kv)
    arr.addProp("logicalType", "map")
    arr
  }

  private val entrySchema: Schema = {
    val boundsSchema = logicalMapSchema(100, 101)
    SchemaBuilder.record("manifest_entry").fields()
      .name("status").prop("field-id", "0").`type`().intType().noDefault()
      .name("file_path").prop("field-id", "1").`type`().stringType().noDefault()
      .name("lower_bounds").prop("field-id", "2").`type`(
        Schema.createUnion(Schema.create(Schema.Type.NULL), boundsSchema)).withDefault(null)
      .endRecord()
  }

  private def kvRecord(mapSchema: Schema, id: Int, bytes: Array[Byte]): GenericRecord = {
    val rec = new GenericData.Record(mapSchema.getElementType)
    rec.put("key", id)
    rec.put("value", ByteBuffer.wrap(bytes))
    rec
  }

  private def writeManifest(path: String, entries: Seq[Map[Int, Array[Byte]]]): Unit = {
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
    writer.create(entrySchema, new java.io.File(path))
    val boundsSchema = entrySchema.getField("lower_bounds").schema().getTypes.get(1)
    entries.zipWithIndex.foreach { case (bounds, i) =>
      val rec = new GenericData.Record(entrySchema)
      rec.put("status", 1)
      rec.put("file_path", s"file-$i.parquet")
      rec.put("lower_bounds",
        new GenericData.Array[GenericRecord](boundsSchema,
          bounds.map { case (id, b) => kvRecord(boundsSchema, id, b) }.toSeq.asJava))
      writer.append(rec)
    }
    writer.close()
  }

  private val dict = Map(
    1 -> "date", 2 -> "timestamptz", 3 -> "decimal(9, 2)", 4 -> "uuid",
    5 -> "double", 6 -> "float", 7 -> "boolean", 8 -> "time")

  test("all Iceberg primitive bound types decode through the distributed path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-synth").toString
    val uuid = java.util.UUID.fromString("12345678-1234-5678-1234-567812345678")
    val bounds = Map(
      1 -> SingleValueCodec.encode(TDate, java.time.LocalDate.of(2024, 3, 1)),
      2 -> SingleValueCodec.encode(TTimestamptz, java.time.Instant.parse("2024-03-01T12:30:00Z")),
      3 -> SingleValueCodec.encode(TDecimal(9, 2), new java.math.BigDecimal("12345.67")),
      4 -> SingleValueCodec.encode(TUuid, uuid),
      5 -> SingleValueCodec.encode(TDouble, 3.5d),
      6 -> SingleValueCodec.encode(TFloat, 2.25f),
      7 -> SingleValueCodec.encode(TBoolean, true),
      8 -> SingleValueCodec.encode(TTime, 49_530_000_000L))
    writeManifest(s"$dir/m0.avro", Seq(bounds))
    writeManifest(s"$dir/m1.avro", Seq(Map(1 ->
      SingleValueCodec.encode(TDate, java.time.LocalDate.of(2025, 1, 1)))))

    // multi-file scan: 2 manifests → 2 partitions
    val entries = ManifestReader.entries(spark, Seq(s"$dir/m0.avro", s"$dir/m1.avro"))
    assert(entries.rdd.getNumPartitions == 2)

    import org.apache.spark.sql.functions.col
    val decoded = entries
      .withColumn("dec", BoundDecode.decodeBounds(spark, col("lower_bounds"), dict))
      .orderBy(col("file_path"))
      .collect()
    assert(decoded.length == 2)
    val m = decoded(0).getAs[Map[Int, String]]("dec")
    assert(m(1) == "value:2024-03-01;type:date")
    assert(m(2) == "value:2024-03-01T12:30:00Z;type:timestamptz")
    assert(m(3) == "value:12345.67;type:decimal(9, 2)")
    assert(m(4) == s"value:$uuid;type:uuid")
    assert(m(5) == "value:3.5;type:double")
    assert(m(6) == "value:2.25;type:float")
    assert(m(7) == "value:true;type:boolean")
    assert(m(8) == "value:49530000000;type:time")
    assert(decoded(1).getAs[Map[Int, String]]("dec")(1) == "value:2025-01-01;type:date")
  }

  test("manifest set spanning a writer-schema evolution resolves per file") {
    // v1 writer: (status, file_path); v2 adds record_count with a default —
    // each container must resolve with its OWN header schema against the
    // common reader schema (a head-file-only writer schema mis-decodes the
    // other vintage).
    val v1 = SchemaBuilder.record("manifest_entry").fields()
      .name("status").`type`().intType().noDefault()
      .name("file_path").`type`().stringType().noDefault()
      .endRecord()
    val v2 = SchemaBuilder.record("manifest_entry").fields()
      .name("status").`type`().intType().noDefault()
      .name("file_path").`type`().stringType().noDefault()
      .name("record_count").`type`().longType().longDefault(-1L)
      .endRecord()
    val dir = java.nio.file.Files.createTempDirectory("graft-evo").toString
    def writeWith(schema: Schema, path: String, fp: String, rc: Option[Long]): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(path))
      val r = new GenericData.Record(schema)
      r.put("status", 1); r.put("file_path", fp)
      rc.foreach(v => r.put("record_count", v))
      w.append(r); w.close()
    }
    writeWith(v1, s"$dir/old.avro", "old.parquet", None)
    writeWith(v2, s"$dir/new.avro", "new.parquet", Some(42L))

    import org.apache.spark.sql.functions.col
    // head file = NEW vintage: old file must still decode, default filling in
    val up = ManifestReader.entries(spark, Seq(s"$dir/new.avro", s"$dir/old.avro"))
      .orderBy(col("file_path")).collect()
    assert(up.map(_.getAs[String]("file_path")).toSeq == Seq("new.parquet", "old.parquet"))
    assert(up.map(_.getAs[Long]("record_count")).toSeq == Seq(42L, -1L))

    // head file = OLD vintage: new file's extra field projects away cleanly
    val down = ManifestReader.entries(spark, Seq(s"$dir/old.avro", s"$dir/new.avro"))
      .orderBy(col("file_path")).collect()
    assert(down.map(_.getAs[String]("file_path")).toSeq == Seq("new.parquet", "old.parquet"))
    assert(!down.head.schema.fieldNames.contains("record_count"))
  }

  test("typed pruning works on date bounds from the synthetic manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-synth2").toString
    writeManifest(s"$dir/m.avro", Seq(
      Map(1 -> SingleValueCodec.encode(TDate, java.time.LocalDate.of(2024, 1, 1))),
      Map(1 -> SingleValueCodec.encode(TDate, java.time.LocalDate.of(2025, 6, 1)))))
    val entries = ManifestReader.entries(spark, Seq(s"$dir/m.avro"))
    import org.apache.spark.sql.functions.col
    // lower-bound-only pruning: keep files whose data may be <= 2024-12-31,
    // i.e. lower_bounds(date) <= upper predicate
    val dec = graft.functions.BoundDecode.decodedBound(
      Map(1 -> "date"), col("lower_bounds"), 1)
    val kept = entries.filter(dec.cast("date") <= java.sql.Date.valueOf("2024-12-31"))
      .select(col("file_path")).collect().map(_.getString(0))
    assert(kept.toSeq == Seq("file-0.parquet"))
  }
}
