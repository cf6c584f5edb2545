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

  final case class FrameSample(
      doc_id: Long, n_frames: Int, n_sampled: Int, first_frame_hash: Long,
      sampled_hash: Long)

  /** "Video" frame sampling over the binary payload: fixed-size frames
    * (256 B stand-ins for decoded frames), keep every 4th (the uniform
    * temporal subsample a vision-pretraining pipeline takes), per-frame
    * rolling hash folded into a sample digest. Runs inside the partition
    * iterator — the frame loop touches each payload byte once, no per-row
    * task setup, no shuffle until the final sort. The real ffmpeg frame
    * decode would replace `frameHash` per the declared-stub contract;
    * the batching, sampling arithmetic, and schema are the real pipeline. */
  val frameSamples: Q = (spark, dir) => {
    import spark.implicits._
    val FrameBytes = 256
    val Stride = 4
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("format"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        def frameHash(start: Int, end: Int): Long = {
          var h = graft.functions.TextAlgos.FnvOffset
          var i = start
          while (i < end) {
            h ^= (r.payload(i) & 0xffL); h *= graft.functions.TextAlgos.FnvPrime
            i += 1
          }
          h
        }
        val n = (r.payload.length + FrameBytes - 1) / FrameBytes
        var sampled = 0
        var digest = graft.functions.TextAlgos.FnvOffset
        var first = 0L
        var f = 0
        while (f < n) {
          if (f % Stride == 0) {
            val h = frameHash(f * FrameBytes, math.min((f + 1) * FrameBytes, r.payload.length))
            if (sampled == 0) first = h
            digest ^= java.lang.Long.rotateLeft(h, sampled % 64)
            sampled += 1
          }
          f += 1
        }
        FrameSample(r.doc_id, n, sampled, first, digest)
      })
      .toDF()
      .orderBy(col("doc_id"))
  }

  final case class Thumb(doc_id: Long, orig_len: Int, thumb_len: Int, thumb_hash: Long)

  /** "Resize" plumbing: downsample each payload to a ≤64-byte thumbnail by
    * striding (the real image resize would sit where `stride` sampling
    * does, per the declared-stub contract); per-record work stays inside
    * the partition iterator, output is a fixed small schema regardless of
    * input payload size — the shape that keeps a 100 TB media resize
    * shuffle-free and output-bounded. */
  val thumbnails: Q = (spark, dir) => {
    import spark.implicits._
    val Target = 64
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("format"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val n = r.payload.length
        val stride = math.max(1, n / Target)
        var h = graft.functions.TextAlgos.FnvOffset
        var count = 0
        var i = 0
        while (i < n && count < Target) {
          h ^= (r.payload(i) & 0xffL); h *= graft.functions.TextAlgos.FnvPrime
          count += 1
          i += stride
        }
        Thumb(r.doc_id, n, count, h)
      })
      .toDF()
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "m01_media_features" -> mediaFeatures,
    "m02_media_records" -> mediaRecords,
    "m03_frame_samples" -> frameSamples,
    "m04_thumbnails" -> thumbnails)

  val oracles: Map[String, String] = Map.empty
}
