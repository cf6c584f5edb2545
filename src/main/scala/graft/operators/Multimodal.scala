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

  /** m05 — REAL WAV decode (no stub): each document synthesizes a
    * deterministic 16-bit PCM mono fixture (sample values pure integer
    * arithmetic over doc_id, so DuckDB recomputes them from first
    * principles), [[MediaCodecs.encodeWav]] lays it out as a
    * spec-conforming RIFF container, and [[MediaCodecs.decodeWav]] — the
    * operator under test — walks the chunk list and folds amplitude
    * stats in one pass. All-integer outputs: exact cross-engine
    * equality, no float tolerance. Encode+decode inversions that cancel
    * (both sides big-endian) are pinned separately by MediaCodecSpec's
    * golden bytes. Per-record work inside the partition iterator; the
    * only shuffle is the final global rollup. */
  val wavDecode: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val n = 100 + (id % 50).toInt
        val samples = Array.tabulate(n)(i =>
          (((id * 31 + i * 7) % 2003) - 1001).toShort)
        val info = MediaCodecs.decodeWav(MediaCodecs.encodeWav(8000, samples))
        require(info.sampleRate == 8000 && info.channels == 1 &&
          info.bitsPerSample == 16, s"decode header mismatch: $info")
        (id, info.nSamples.toLong, info.durationUs, info.maxAbs.toLong, info.sumAbs)
      })
      .toDF("doc_id", "n", "dur", "mx", "sa")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n").cast("long").as("n_samples"),
        sum($"dur").cast("long").as("duration_us"),
        sum($"mx").cast("long").as("sum_max_abs"),
        sum($"sa").cast("long").as("sum_abs"))
  }

  val wavDecodeSql: String =
    """WITH s AS (
      |  SELECT doc_id, unnest(generate_series(0, 99 + doc_id % 50)) AS i
      |  FROM documents),
      |v AS (SELECT doc_id, ABS((doc_id * 31 + i * 7) % 2003 - 1001) AS a FROM s),
      |p AS (SELECT doc_id, COUNT(*) AS n, MAX(a) AS mx, SUM(a) AS sa
      |      FROM v GROUP BY doc_id)
      |SELECT COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_samples,
      |  CAST(SUM(n) * 125 AS BIGINT) AS duration_us,
      |  CAST(SUM(mx) AS BIGINT) AS sum_max_abs,
      |  CAST(SUM(sa) AS BIGINT) AS sum_abs
      |FROM p""".stripMargin

  /** m06 — REAL BMP decode (no stub): deterministic 24-bit pixel
    * fixtures whose widths run 4..8 so the ROW PADDING actually varies
    * (width·3 mod 4 ∈ {0,1,2,3}) and bottom-up row order matters; the
    * decoder honors the declared pixel-array offset, padded stride and
    * BGR order — get any of them wrong and the channel sum diverges
    * from DuckDB's arithmetic recomputation. */
  val bmpDecode: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        val bytes = MediaCodecs.encodeBmp(w, h,
          (x, y, c) => ((id + x * 3 + y * 7 + c * 11) % 256).toInt)
        val info = MediaCodecs.decodeBmp(bytes)
        require(info.width == w && info.height == h,
          s"decoded dimensions ${info.width}x${info.height} != ${w}x$h")
        (id, w.toLong, h.toLong, info.sumChannels)
      })
      .toDF("doc_id", "w", "h", "sc")
      .agg(count(lit(1)).as("n_docs"),
        sum($"w").cast("long").as("sum_width"),
        sum($"h").cast("long").as("sum_height"),
        sum($"sc").cast("long").as("sum_channels"))
  }

  val bmpDecodeSql: String =
    """WITH xs AS (SELECT doc_id,
      |    unnest(generate_series(0, 3 + doc_id % 5)) AS x FROM documents),
      |ys AS (SELECT doc_id, x,
      |    unnest(generate_series(0, 2 + doc_id % 4)) AS y FROM xs),
      |cs AS (SELECT doc_id, x, y, unnest([0, 1, 2]) AS c FROM ys)
      |SELECT COUNT(*) AS n_docs,
      |  CAST(SUM(4 + doc_id % 5) AS BIGINT) AS sum_width,
      |  CAST(SUM(3 + doc_id % 4) AS BIGINT) AS sum_height,
      |  CAST((SELECT SUM((doc_id + x * 3 + y * 7 + c * 11) % 256) FROM cs)
      |    AS BIGINT) AS sum_channels
      |FROM documents""".stripMargin

  /** m07 — REAL PNG decode (no stub, no imaging library): deterministic
    * 8-bit fixtures alternating truecolor and truecolor+alpha (bpp 3 and
    * 4 exercise both unfilter strides), encoded with a DIFFERENT filter
    * type per scanline (y % 5 — every row past the fourth re-tests all
    * five reconstruction branches against varying predecessors) and the
    * zlib stream split across two IDAT chunks. Unlike WAV/BMP the pixel
    * bytes are not at any fixed offset: the decoder must verify chunk
    * CRCs, concatenate IDAT, inflate, and invert each row's filter before
    * a single channel byte exists to sum — any error anywhere in that
    * chain diverges from DuckDB's first-principles recomputation of the
    * pixel formula. All-integer outputs: exact cross-engine equality.
    * Encode/decode inversions that cancel are pinned separately by
    * PngCodecSpec (hand-laid golden bytes + javax.imageio
    * cross-validation). Per-record work inside the partition iterator;
    * the only shuffle is the final global rollup. */
  val pngDecode: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        val ch = 3 + (id % 2).toInt
        val bytes = MediaCodecs.encodePng(w, h, ch,
          (x, y, c) => ((id + x * 5 + y * 11 + c * 13) % 256).toInt)
        val info = MediaCodecs.decodePng(bytes)
        require(info.width == w && info.height == h && info.channels == ch,
          s"decoded shape ${info.width}x${info.height}x${info.channels} != ${w}x${h}x$ch")
        (id, w.toLong, h.toLong, info.sumChannels)
      })
      .toDF("doc_id", "w", "h", "sc")
      .agg(count(lit(1)).as("n_docs"),
        sum($"w").cast("long").as("sum_width"),
        sum($"h").cast("long").as("sum_height"),
        sum($"sc").cast("long").as("sum_channels"))
  }

  val pngDecodeSql: String =
    """WITH xs AS (SELECT doc_id,
      |    unnest(generate_series(0, 3 + doc_id % 5)) AS x FROM documents),
      |ys AS (SELECT doc_id, x,
      |    unnest(generate_series(0, 2 + doc_id % 4)) AS y FROM xs),
      |cs AS (SELECT doc_id, x, y,
      |    unnest(generate_series(0, 2 + doc_id % 2)) AS c FROM ys)
      |SELECT COUNT(*) AS n_docs,
      |  CAST(SUM(4 + doc_id % 5) AS BIGINT) AS sum_width,
      |  CAST(SUM(3 + doc_id % 4) AS BIGINT) AS sum_height,
      |  CAST((SELECT SUM((doc_id + x * 5 + y * 11 + c * 13) % 256) FROM cs)
      |    AS BIGINT) AS sum_channels
      |FROM documents""".stripMargin

  /** m08 — REAL baseline JPEG decode (no stub, no imaging library on the
    * decode side): deterministic smooth-gradient RGB fixtures are
    * encoded by javax.imageio (FOREIGN bytes — its Huffman tables, its
    * 4:2:0 subsampling, its quantization) and decoded by
    * [[JpegCodec.decode]]: marker walk, canonical Huffman construction,
    * entropy decode with byte-unstuffing, dequantize + dezigzag, IDCT,
    * YCbCr→RGB with chroma upsampling. JPEG is LOSSY with
    * spec-sanctioned IDCT latitude, so the entry (a) requires per-pixel
    * proximity (≤8) to imageio's own independent decode in-entry and
    * (b) emits OUR decoder's channel sums, which are deterministic and
    * pinned by a golden VALUES oracle at the verify scale (DuckDB
    * cannot inflate a DCT). Smooth gradients keep the box-vs-triangle
    * chroma-upsampling difference inside the tolerance. Per-record work
    * inside the partition iterator; the only shuffle is the final
    * rollup. */
  val jpegDecode: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        // ImageIO's default stream cache backs every write/read call with
        // a TEMP FILE: two file create+delete round trips per record.
        // Heap-backed streams produce byte-identical jpegs (the cache only
        // buffers; it never changes the codec path), so the oracle-pinned
        // sums are untouched. Idempotent JVM-global — set once per task.
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
        val w = 24 + (id % 9).toInt
        val h = 16 + (id % 7).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              ((20 + x * 4 + y * 2) << 16) | ((30 + x * 2 + y * 3) << 8) |
                (60 + x + y * 4))
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, "jpg", out), "imageio jpeg writer missing")
        val jpeg = out.toByteArray
        val ours = JpegCodec.decode(jpeg)
        require(ours.width == w && ours.height == h && ours.components == 3,
          s"decoded shape ${ours.width}x${ours.height}x${ours.components} != ${w}x${h}x3")
        val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
        var maxDelta = 0
        y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val a = ours.pixels(y * w + x); val b = ref.getRGB(x, y)
            var s = 0
            while (s <= 16) {
              val d = math.abs(((a >> s) & 0xff) - ((b >> s) & 0xff))
              if (d > maxDelta) maxDelta = d
              s += 8
            }
            x += 1
          }
          y += 1
        }
        require(maxDelta <= 8, s"doc $id: delta $maxDelta vs imageio decode")
        (id, ours.sumR, ours.sumG, ours.sumB)
      } }
      .toDF("doc_id", "r", "g", "b")
      .agg(count(lit(1)).as("n_docs"),
        sum($"r").cast("long").as("sum_r"),
        sum($"g").cast("long").as("sum_g"),
        sum($"b").cast("long").as("sum_b"))
  }

  /** m09 — REAL GIF decode ([[GifCodec]]): the m-family's LZW leg,
    * implemented from the GIF89a spec with no library anywhere in the
    * DECODE chain (PNG delegated the bit-level inflate to the JDK; LZW
    * has no JDK primitive, so the variable-width dictionary
    * decompressor is ours end to end). Fixtures are palette-indexed
    * images ENCODED BY javax.imageio — foreign bytes, its LZW encoder's
    * code stream, its block splits — whose palette and index pattern
    * follow integer formulas, so DuckDB recomputes the exact channel
    * sums from first principles: GIF is lossless and channel sums are
    * palette-ORDER-invariant (a pixel's color survives any palette
    * permutation the writer picks). In-entry, every pixel is also
    * required EQUAL to imageio's own independent decode — the lossless
    * analogue of m08's ≤8-delta proximity gate. Per-record work inside
    * the partition iterator; the only shuffle is the final rollup. */
  val gifDecode: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        // heap-backed ImageIO streams — see jpegDecode; byte-identical gifs
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
        val w = 8 + (id % 7).toInt
        val h = 6 + (id % 5).toInt
        val n = 64
        val r = Array.tabulate(n)(i => ((i * 3) % 256).toByte)
        val g = Array.tabulate(n)(i => ((i * 5) % 256).toByte)
        val b = Array.tabulate(n)(i => ((i * 7) % 256).toByte)
        val icm = new java.awt.image.IndexColorModel(8, n, r, g, b)
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.getRaster.setSample(x, y, 0, ((id + x * 7 + y * 13) % n).toInt)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, "gif", out), "imageio gif writer missing")
        val gif = out.toByteArray
        val ours = GifCodec.decode(gif)
        require(ours.width == w && ours.height == h,
          s"decoded ${ours.width}x${ours.height} != ${w}x$h")
        val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
        y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            require((ours.rgb(y * w + x) & 0xffffff) == (ref.getRGB(x, y) & 0xffffff),
              s"doc $id pixel ($x,$y): ${ours.rgb(y * w + x)} != ${ref.getRGB(x, y)}")
            x += 1
          }
          y += 1
        }
        (id, w.toLong, h.toLong, ours.sumChannels)
      } }
      .toDF("doc_id", "w", "h", "sc")
      .agg(count(lit(1)).as("n_docs"),
        sum($"w").cast("long").as("sum_width"),
        sum($"h").cast("long").as("sum_height"),
        sum($"sc").cast("long").as("sum_channels"))
  }

  val gifDecodeSql: String =
    """WITH xs AS (SELECT doc_id,
      |    unnest(generate_series(0, 7 + doc_id % 7)) AS x FROM documents),
      |ys AS (SELECT doc_id, x,
      |    unnest(generate_series(0, 5 + doc_id % 5)) AS y FROM xs),
      |px AS (SELECT doc_id, (doc_id + x * 7 + y * 13) % 64 AS i FROM ys)
      |SELECT COUNT(*) AS n_docs,
      |  CAST(SUM(8 + doc_id % 7) AS BIGINT) AS sum_width,
      |  CAST(SUM(6 + doc_id % 5) AS BIGINT) AS sum_height,
      |  CAST((SELECT SUM((i * 3) % 256 + (i * 5) % 256 + (i * 7) % 256) FROM px)
      |    AS BIGINT) AS sum_channels
      |FROM documents""".stripMargin

  val queries: Map[String, Q] = Map(
    "m09_gif_decode" -> gifDecode,
    "m01_media_features" -> mediaFeatures,
    "m02_media_records" -> mediaRecords,
    "m03_frame_samples" -> frameSamples,
    "m04_thumbnails" -> thumbnails,
    "m05_wav_decode" -> wavDecode,
    "m06_bmp_decode" -> bmpDecode,
    "m07_png_decode" -> pngDecode,
    "m08_jpeg_decode" -> jpegDecode)

  val oracles: Map[String, String] = Map(
    "m05_wav_decode" -> wavDecodeSql,
    "m06_bmp_decode" -> bmpDecodeSql,
    "m07_png_decode" -> pngDecodeSql,
    "m09_gif_decode" -> gifDecodeSql)
}
