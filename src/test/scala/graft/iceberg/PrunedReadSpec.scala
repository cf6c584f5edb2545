package graft.iceberg

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.SparkSpec
import graft.iceberg.IcebergTypes._

/** The full scan-planning loop the reference's bound decoding exists to
  * enable (SURVEY.md §4): write real data files, describe them in a
  * manifest with genuine encoded bound statistics, prune on a predicate
  * against the decoded bounds, and read back ONLY the surviving files.
  * This is what "plan proportional to metadata, scan proportional to the
  * predicate" means at 100 TB.
  */
class PrunedReadSpec extends SparkSpec {

  private val entrySchema: Schema = {
    val kv = SchemaBuilder.record("kv").fields()
      .name("key").`type`().intType().noDefault()
      .name("value").`type`().bytesType().noDefault()
      .endRecord()
    val bounds = Schema.createArray(kv)
    bounds.addProp("logicalType", "map")
    SchemaBuilder.record("manifest_entry").fields()
      .name("status").`type`().intType().noDefault()
      .name("data_file").`type`(SchemaBuilder.record("r2").fields()
        .name("file_path").`type`().stringType().noDefault()
        .name("record_count").`type`().longType().noDefault()
        .name("lower_bounds").`type`(bounds).noDefault()
        .name("upper_bounds").`type`(bounds).noDefault()
        .endRecord()).noDefault()
      .endRecord()
  }

  test("predicate on decoded bounds prunes the physical read to matching files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pruned").toString

    // three data files, value ranges [0,99], [100,199], [200,299]
    val ranges = Seq((0L, 99L), (100L, 199L), (200L, 299L))
    val dataPaths = ranges.zipWithIndex.map { case ((lo, hi), i) =>
      val p = s"$dir/data-$i.parquet"
      (lo to hi).toDF("v").coalesce(1).write.mode("overwrite").parquet(p)
      (p, lo, hi)
    }

    // one manifest describing them, bounds in Iceberg single-value encoding
    val manifestPath = s"$dir/manifest.avro"
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
    writer.create(entrySchema, new java.io.File(manifestPath))
    val dfSchema = entrySchema.getField("data_file").schema()
    val boundsSchema = dfSchema.getField("lower_bounds").schema()
    def kvArr(id: Int, v: Long) = {
      val rec = new GenericData.Record(boundsSchema.getElementType)
      rec.put("key", id)
      rec.put("value", ByteBuffer.wrap(SingleValueCodec.encode(TLong, v)))
      new GenericData.Array[GenericRecord](boundsSchema, Seq(rec.asInstanceOf[GenericRecord]).asJava)
    }
    dataPaths.foreach { case (p, lo, hi) =>
      val df = new GenericData.Record(dfSchema)
      df.put("file_path", p)
      df.put("record_count", hi - lo + 1)
      df.put("lower_bounds", kvArr(1, lo))
      df.put("upper_bounds", kvArr(1, hi))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("data_file", df)
      writer.append(e)
    }
    writer.close()

    val meta = TableMetadata.parse(
      """{"format-version":1,"schema":{"type":"struct","schema-id":0,"fields":[
        |  {"id":1,"name":"v","required":true,"type":"long"}]}}""".stripMargin)

    // predicate: 120 <= v <= 150 → only the middle file qualifies
    val survivors = ScanPlanning.planFiles(spark, meta, Seq(manifestPath),
      fieldId = 1, lower = Some(120L), upper = Some(150L))
    assert(survivors == Seq(dataPaths(1)._1), s"got $survivors")

    // the pruned read touches one file and returns exactly the predicate rows
    val result = spark.read.parquet(survivors: _*).filter($"v".between(120, 150))
    assert(result.count() == 31)
    assert(result.inputFiles.length == 1)

    // unbounded predicate keeps everything (conservative pruning)
    val all = ScanPlanning.planFiles(spark, meta, Seq(manifestPath), 1, None, None)
    assert(all.toSet == dataPaths.map(_._1).toSet)

    // boundary inclusivity: lower == a file's max keeps that file
    val edge = ScanPlanning.planFiles(spark, meta, Seq(manifestPath), 1, Some(199L), None)
    assert(edge.toSet == Set(dataPaths(1)._1, dataPaths(2)._1))
  }
}
