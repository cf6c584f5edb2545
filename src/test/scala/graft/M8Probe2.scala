package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev utility (r21): m08 under 32 threads — ImageIO.write/read static
  * lookups per record vs per-partition writer/reader reuse. */
object M8Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("m8probe", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._

    def variant(reuse: Boolean): DataFrame =
      graft.Tables.load(spark, dir, "documents")
        .select($"doc_id").as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          val writer = if (reuse)
            javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next() else null
          val reader = if (reuse)
            javax.imageio.ImageIO.getImageReadersByFormatName("jpg").next() else null
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
            if (reuse) {
              val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
              writer.setOutput(ios)
              writer.write(img)
              ios.close()
            } else {
              require(javax.imageio.ImageIO.write(img, "jpg", out), "no writer")
            }
            val jpeg = out.toByteArray
            val ours = graft.operators.JpegCodec.decode(jpeg)
            require(ours.width == w && ours.height == h && ours.components == 3)
            val ref = if (reuse) {
              val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
                new java.io.ByteArrayInputStream(jpeg))
              reader.setInput(iis)
              val r = reader.read(0)
              iis.close()
              r
            } else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
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
            require(maxDelta <= 8, s"doc $id: delta $maxDelta")
            (id, ours.sumR, ours.sumG, ours.sumB)
          }
        }
        .toDF("doc_id", "r", "g", "b")
        .agg(count(lit(1)).as("n_docs"),
          sum($"r").cast("long").as("sum_r"),
          sum($"g").cast("long").as("sum_g"),
          sum($"b").cast("long").as("sum_b"))

    SparkEntry.entry(spark).count()
    // results must be identical between the variants
    val a = variant(reuse = false).collect().toSeq
    val b = variant(reuse = true).collect().toSeq
    println(s"EQ identical=${a == b} $a vs $b")
    (1 to 3).foreach { round =>
      Seq("lookupPerRecord" -> false, "reusePerPartition" -> true).foreach {
        case (name, r) =>
          val t0 = System.nanoTime()
          variant(r).count()
          println(f"PERF m08/$name round$round ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
