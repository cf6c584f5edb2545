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

  test("DSv2 scan reports file-length statistics to Catalyst") {
    val df = spark.read.format("graft-manifest")
      .option("metadata", graft.operators.IcebergQueries.FixtureMetadata)
      .load(graft.operators.IcebergQueries.FixtureManifest)
    val stats = df.queryExecution.optimizedPlan.stats
    val onDisk = new java.io.File(graft.operators.IcebergQueries.FixtureManifest).length()
    assert(stats.sizeInBytes.toLong == onDisk,
      s"sizeInBytes ${stats.sizeInBytes} != manifest length $onDisk")
    // metadata-sized relation ⇒ joins against it broadcast without hints
    val joined = spark.range(1000).toDF("id")
      .join(df.select(org.apache.spark.sql.functions.col("status")),
        org.apache.spark.sql.functions.col("id") ===
          org.apache.spark.sql.functions.col("status"))
    joined.collect()
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "manifest side should broadcast from reported stats")
  }

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

  test("DSv2 filter pushdown on virtual stat columns drops all-pruned manifests at planning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsv2-push").toString

    def writeManifest(path: String, files: Seq[(String, Long, Long)]): Unit = {
      val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
      writer.create(entrySchema, new java.io.File(path))
      val dfSchema = entrySchema.getField("data_file").schema()
      val boundsSchema = dfSchema.getField("lower_bounds").schema()
      def kvArr(id: Int, v: Long) = {
        val rec = new GenericData.Record(boundsSchema.getElementType)
        rec.put("key", id)
        rec.put("value", ByteBuffer.wrap(SingleValueCodec.encode(TLong, v)))
        new GenericData.Array[GenericRecord](boundsSchema, Seq(rec.asInstanceOf[GenericRecord]).asJava)
      }
      files.foreach { case (p, lo, hi) =>
        val df = new GenericData.Record(dfSchema)
        df.put("file_path", p); df.put("record_count", hi - lo + 1)
        df.put("lower_bounds", kvArr(1, lo)); df.put("upper_bounds", kvArr(1, hi))
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1); e.put("data_file", df)
        writer.append(e)
      }
      writer.close()
    }
    writeManifest(s"$dir/mA.avro", Seq(("a0.parquet", 0L, 99L), ("a1.parquet", 100L, 199L)))
    writeManifest(s"$dir/mB.avro", Seq(("b0.parquet", 1000L, 1999L)))

    val metaPath = s"$dir/metadata.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(metaPath),
      """{"format-version":1,"schema":{"type":"struct","schema-id":0,"fields":[
        |  {"id":1,"name":"v","required":true,"type":"long"}]}}""".stripMargin)

    import org.apache.spark.sql.functions.col
    val base = spark.read.format("graft-manifest")
      .option("metadata", metaPath)
      .load(s"$dir/mA.avro", s"$dir/mB.avro")

    // virtual columns are typed and decoded from the bound blobs
    val all = base.select(col("data_file.file_path"), col("lower_v"), col("upper_v"))
      .orderBy(col("lower_v")).collect()
    assert(all.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a0.parquet", 0L, 99L), ("a1.parquet", 100L, 199L), ("b0.parquet", 1000L, 1999L)))

    // selective predicate: only manifest B can match → one InputPartition
    val pruned = base.filter(col("upper_v") >= 1000 || col("upper_v").isNull)
      .select(col("data_file.file_path").as("file_path"))
    assert(pruned.rdd.getNumPartitions == 1,
      s"expected planning-time manifest pruning, got ${pruned.rdd.getNumPartitions} partitions")
    assert(pruned.collect().map(_.getString(0)).toSeq == Seq("b0.parquet"))
    // the pushed filter is visible in the scan description
    assert(pruned.queryExecution.executedPlan.toString.contains("PushedFilters"),
      pruned.queryExecution.executedPlan.toString)

    // row-level skip inside a surviving manifest: a1 matches, a0 filtered at decode
    val rows = base.filter(col("lower_v") >= 100 && col("upper_v") <= 199)
      .select(col("data_file.file_path").as("file_path")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a1.parquet"))

    // limit pushdown (--head parity): the scan stops decoding per
    // partition and advertises the pushed limit
    val limited = base.select(col("data_file.file_path")).limit(1)
    assert(limited.queryExecution.executedPlan.toString.contains("PushedLimit: 1"),
      limited.queryExecution.executedPlan.toString)
    assert(limited.collect().length == 1)
  }
}
