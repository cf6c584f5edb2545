package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with decode/feature-extraction as per-partition batch processing.
  *
  * The Spark-side shape is the real thing — binary column, metadata
  * struct, `mapPartitions` batch iteration with a case-class Encoder (the
  * Scala analog of `mapInPandas` batches), partition sizing driven by
  * payload bytes rather than row count. The decoder itself is a STUB
  * (deterministic fake): image/audio codecs are not in this container, so
  * `FakeDecoder.decode` stands in where libjpeg/ffmpeg bindings would sit.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  final case class MediaRecord(doc_id: Long, format: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, format: String, byte_len: Int,
      width: Int, height: Int, mean_intensity: Double, feature_hash: Long)

  /** STUB decoder — deterministic fake standing in for the real codec
    * (marked per the builder contract; the pipeline around it is real). */
  object FakeDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      // "Decode" dimensions from the payload header bytes; reduce the
      // payload exactly once, the way a real frame decode would.
      val len = r.payload.length
      val width = 64 + (math.abs(r.doc_id) % 16).toInt * 32
      val height = 64 + (len % 16) * 32
      var sum = 0L
      var h = graft.functions.TextAlgos.FnvOffset
      var i = 0
      while (i < len) {
        sum += (r.payload(i) & 0xff)
        h ^= (r.payload(i) & 0xffL); h *= graft.functions.TextAlgos.FnvPrime
        i += 1
      }
      MediaFeatures(r.doc_id, r.format, len, width, height,
        if (len == 0) 0.0 else sum.toDouble / len, h)
    }
  }

  /** Documents → synthetic binary payloads → batch "decode" →
    * per-format feature rollup. One narrow pipeline stage (mapPartitions),
    * then a small aggregation; at 100 TB the only knobs are
    * files.maxPartitionBytes (payload-sized splits) and keeping decode
    * inside the partition iterator (no per-row task setup). */
  val mediaFeatures: Q = (spark, dir) => {
    import spark.implicits._
    val media = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("format"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRecord]
    media
      .mapPartitions(_.map(FakeDecoder.decode))
      .groupBy($"format")
      .agg(count(lit(1)).as("n_media"),
        sum($"byte_len").as("total_bytes"),
        min($"width").as("min_width"), max($"height").as("max_height"),
        (sum($"mean_intensity").cast("double") / count(lit(1))).as("avg_intensity"))
      .orderBy($"format")
  }

  /** Per-record features (rows-only; determinism asserted in ScalaTest). */
  val mediaRecords: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("format"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRecord]
      .mapPartitions(_.map(FakeDecoder.decode))
      .toDF()
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "m01_media_features" -> mediaFeatures,
    "m02_media_records" -> mediaRecords)

  val oracles: Map[String, String] = Map.empty
}
