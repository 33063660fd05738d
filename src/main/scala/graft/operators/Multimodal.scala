package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in partition-sized batches.
  *
  * IMAGE decode is REAL — [[ImageIoDecoder]] and [[decodeImageCensus]] run
  * the JDK's own `javax.imageio` codecs (PNG/BMP/GIF/JPEG/TIFF, headless,
  * no external libraries — r15 verdict task 1). AUDIO decode is real for
  * PCM WAV — [[decodeAudioCensus]] runs `javax.sound.sampled`. Compressed
  * audio (MP3/AAC) and video codecs remain genuinely absent from this
  * JDK, so those kinds keep the [[DeterministicFakeDecoder]] metadata
  * contract; the Spark-side plumbing (schema, batching, partitioning,
  * null handling) is identical either way.
  * In PySpark this layer would be `mapInPandas` with Arrow batches;
  * the Scala-native equivalent is `mapPartitions` over a typed Dataset,
  * which likewise amortizes per-batch setup (decoder init happens once per
  * partition, not per row — the property that matters at 100 TB).
  */
object Multimodal {

  /** A media row: opaque payload + typed envelope. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded/feature-extracted metadata. */
  case class MediaMeta(media_id: Long, kind: String, byte_len: Int,
                       width: Int, height: Int, channels: Int,
                       frames: Int, feature_norm: Double)

  /** Decoder contract: one instance per partition; batch-friendly. */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): MediaMeta
  }

  /** REAL decoder for image payloads: the JDK's `javax.imageio` reads
    * PNG/BMP/GIF/JPEG/TIFF headlessly — no external codec library needed.
    * Width/height/channels come from the DECODED pixels, never from
    * metadata riding beside the payload; `feature_norm` is the mean pixel
    * intensity in [0,1), floor-quantized to 1e-4 so it is
    * aggregation-order safe downstream. COMPRESSED audio codecs (MP3/AAC)
    * and every video framework are genuinely absent from this JDK — PCM
    * WAV decode exists and is exercised by [[decodeAudioCensus]] — so
    * non-image kinds here throw with a named reason rather than fake a
    * decode; [[DeterministicFakeDecoder]] remains their documented
    * metadata contract. */
  object ImageIoDecoder extends MediaDecoder {
    def decode(r: MediaRecord): MediaMeta = r.kind match {
      case "image" =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"media_id=${r.media_id}: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var s = 0L
        var i = 0
        while (i < px.length) {
          val p = px(i)
          s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          i += 1
        }
        val mean = s.toDouble / (3.0 * w * h * 255.0)
        MediaMeta(r.media_id, r.kind, r.payload.length, w, h,
          channels = img.getColorModel.getNumColorComponents,
          frames = 1, feature_norm = math.floor(mean * 10000.0) / 10000.0)
      case k => throw new UnsupportedOperationException(
        s"media_id=${r.media_id}: no $k codec in this JDK — image kinds only " +
          "(audio/video metadata contract is DeterministicFakeDecoder)")
    }
  }

  /** Deterministic fake: metadata is a pure function of the payload bytes
    * via the first 48 bits of md5 — the same value any SQL engine derives
    * from its md5() hex output (`'0x' || substring(md5(x),1,12)`), so the
    * profile over decoded metadata is fully oracle-checkable. */
  object DeterministicFakeDecoder extends MediaDecoder {
    def decode(r: MediaRecord): MediaMeta = {
      val n = r.payload.length
      val md = java.security.MessageDigest.getInstance("MD5").digest(r.payload)
      // first 6 digest bytes big-endian == integer value of the first 12 hex
      // chars of the md5 string
      val h = md.take(6).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      MediaMeta(r.media_id, r.kind, n,
        width = (64L + h % 1024L).toInt, height = (64L + (h / 7L) % 1024L).toInt,
        channels = if (r.kind == "audio") 2 else 3,
        frames = if (r.kind == "video") (1L + n.toLong % 300L).toInt else 1,
        feature_norm = (h % 1000L).toDouble / 1000.0)
    }
  }

  // ------------------------------------------- per-partition codec handles
  //
  // The static entry points (`ImageIO.read/write`, `AudioSystem.write/
  // getAudioInputStream`) run a provider-REGISTRY lookup on every call, and
  // the sound registry (`JDK13Services.getProviders`) is a GLOBAL
  // synchronized section — jstack on a 32-thread x64 run showed all 32
  // executor threads convoying on that lock (~400 µs/row, vs ~30 µs of
  // actual codec work). Resolving the SPI handle ONCE per partition and
  // reusing it is the whole point of the mapPartitions shape; these
  // helpers use only public API (javax.imageio.ImageReader/Writer,
  // javax.sound.sampled.spi via ServiceLoader).

  private def pngWriterHandle(): javax.imageio.ImageWriter = {
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("png")
    require(it.hasNext, "no PNG writer in this JDK")
    it.next()
  }

  private def pngReaderHandle(): javax.imageio.ImageReader = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("png")
    require(it.hasNext, "no PNG reader in this JDK")
    it.next()
  }

  private def encodePng(w: javax.imageio.ImageWriter,
                        img: java.awt.image.BufferedImage,
                        buf: java.io.ByteArrayOutputStream): Array[Byte] = {
    buf.reset()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(buf)
    w.setOutput(out)
    w.write(img)
    out.close()
    buf.toByteArray
  }

  private def decodePng(r: javax.imageio.ImageReader,
                        bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    r.setInput(in, true, true)
    val img = r.read(0)
    in.close()
    img
  }

  private def wavWriterHandle(): javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAVE writer in this JDK"))
  }

  /** All installed audio readers; the caller probes once and reuses the
    * matching reader for the partition (payloads share one container). */
  private def wavReaderHandle(probe: Array[Byte]): javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala
      .find { r =>
        try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close(); true }
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => false }
      }
      .getOrElse(throw new IllegalStateException("no reader accepts the WAVE payload"))
  }

  /** An opaque image payload: id + bytes, NOTHING else — the decode census
    * must recover every dimension from the bytes themselves. */
  case class PngPayload(media_id: Long, payload: Array[Byte])

  /** Per-image decode census: dimensions and EXACT integer per-channel
    * pixel sums, all read from the decoded raster. */
  case class ImageCensus(media_id: Long, width: Long, height: Long,
                         channels: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic PNG fixtures: one real PNG per document, encoded with
    * the JDK's own `javax.imageio` writer inside the executors (stand-in
    * for reading a binary-payload column at scale). Dimensions and pixels
    * are a pure closed-form of `doc_id`, so an oracle can recompute the
    * decode census without ever touching the bytes:
    *
    *   w = 4 + id % 13,  h = 4 + (id div 7) % 13,  seed = id % 251
    *   r(x,y) = (3x +  5y + seed) mod 256
    *   g(x,y) = (7x + 11y + seed) mod 256
    *   b(x,y) = (13x + 17y + seed) mod 256
    *
    * PNG is lossless, so [[decodeImageCensus]] agreeing with the formula
    * proves the encode→decode round-trip bit-exact — a census mismatch of
    * even one pixel in one image moves an integer sum. Encoder handles are
    * per-partition (mapPartitions); the payload column never crosses a
    * shuffle boundary (the census downstream reduces to 7 longs per row
    * before any exchange). Null doc_ids are dropped in BOTH lanes
    * (null-category doctrine). */
  def pngMedia(docs: DataFrame): Dataset[PngPayload] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.where(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long")).as[Long]
      // fan the 8-byte id column out across the cores BEFORE the CPU-bound
      // codec stage: the ids come off a scan whose task count follows FILE
      // sizes (one small parquet = one task locally), while the codec work
      // is per-ROW — this exchange is the local mirror of the file-level
      // parallelism a real cluster gets for free, and it moves nothing but
      // the ids (measured x64: audio census 157 s -> seconds)
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        // per-partition handles: writer resolved once (registry lookup is
        // a global lock — see the codec-handle section above)
        val writer = pngWriterHandle()
        val buf = new java.io.ByteArrayOutputStream(1024)
        it.map { id =>
          val w = (4L + id % 13L).toInt
          val h = (4L + (id / 7L) % 13L).toInt
          val seed = (id % 251L).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = (3 * x + 5 * y + seed) % 256
              val g = (7 * x + 11 * y + seed) % 256
              val b = (13 * x + 17 * y + seed) % 256
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          PngPayload(id, encodePng(writer, img, buf))
        }
      }
  }

  /** REAL image decode at census grain: `javax.imageio` reads each payload
    * back to a raster and the census reports decoded width/height/channels
    * plus exact per-channel integer pixel sums — the quantities an oracle
    * recomputes from [[pngMedia]]'s closed form without decoding anything.
    * mapPartitions so reader state amortizes per task; the output is 7
    * longs per image, which is all that ever shuffles (the sort). At
    * 100 TB the payload column stays inside the scan→decode stage —
    * exactly the economics of a production `binaryFile` + decode UDF
    * pipeline, with the UDF replaced by typed partition iterators. */
  def decodeImageCensus(media: Dataset[PngPayload]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val reader = pngReaderHandle() // once per partition, not per row
      it.map { rec =>
        val img = decodePng(reader, rec.payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        ImageCensus(rec.media_id, w.toLong, h.toLong,
          img.getColorModel.getNumColorComponents.toLong, sr, sg, sb)
      }
    }.toDF().orderBy(col("media_id"))
  }

  /** REAL resize EXECUTION — the pixel work [[resizePlan]] only sizes:
    * decode each PNG, nearest-neighbor downsample by integer `stride`
    * (out(x,y) = in(stride·x, stride·y), out dims = ceil(dim/stride)),
    * RE-ENCODE the result to PNG, decode it AGAIN, and report the final
    * census — so the oracle's agreement proves the full
    * decode → transform → encode → decode chain exact to the pixel, not
    * just a single decode. Per-partition iterator economics as above; at
    * 100 TB this stage is the bandwidth reducer (payload bytes shrink
    * ~stride² before anything downstream touches them). */
  def resizeExec(media: Dataset[PngPayload], stride: Int = 2): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val reader = pngReaderHandle() // per-partition codec handles
      val writer = pngWriterHandle()
      val buf = new java.io.ByteArrayOutputStream(1024)
      it.map { rec =>
        val img = decodePng(reader, rec.payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val ow = (w + stride - 1) / stride
        val oh = (h + stride - 1) / stride
        val out = new java.awt.image.BufferedImage(
          ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            out.setRGB(x, y, img.getRGB(x * stride, y * stride) & 0xffffff)
            x += 1
          }
          y += 1
        }
        val back = decodePng(reader, encodePng(writer, out, buf))
        val px = back.getRGB(0, 0, back.getWidth, back.getHeight, null, 0, back.getWidth)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        ImageCensus(rec.media_id, back.getWidth.toLong, back.getHeight.toLong,
          back.getColorModel.getNumColorComponents.toLong, sr, sg, sb)
      }
    }.toDF().orderBy(col("media_id"))
  }

  /** An opaque multi-frame payload: id + animated-GIF bytes. */
  case class GifPayload(media_id: Long, payload: Array[Byte])

  /** Per-container frame-sampling census: container frame count, how many
    * frames the stride keeps, dimensions, and the exact gray-sum over the
    * SAMPLED frames only. */
  case class FrameCensus(media_id: Long, frames: Long, sampled_frames: Long,
                         width: Long, height: Long, sum_gray: Long)

  /** Deterministic MULTI-FRAME fixtures: one real animated GIF per
    * document (the JDK's own gif plugin writes and reads frame
    * sequences). Grayscale keeps GIF lossless — ≤ 256 distinct colors per
    * frame means the palette preserves every sample bit-exactly:
    *
    *   frames = 2 + id % 9,  w = 4 + id % 11,  h = 4 + (id div 7) % 11,
    *   seed = id % 251,  gray(x,y,f) = (3x + 5y + 11f + seed) mod 256
    */
  def gifMedia(docs: DataFrame): Dataset[GifPayload] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.where(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism) // see [[pngMedia]]
      .mapPartitions { it =>
        val writer = {
          val ws = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
          require(ws.hasNext, "no GIF writer in this JDK")
          ws.next()
        }
        val buf = new java.io.ByteArrayOutputStream(2048)
        it.map { id =>
          val frames = (2L + id % 9L).toInt
          val w = (4L + id % 11L).toInt
          val h = (4L + (id / 7L) % 11L).toInt
          val seed = (id % 251L).toInt
          buf.reset()
          val out = new javax.imageio.stream.MemoryCacheImageOutputStream(buf)
          writer.setOutput(out)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < frames) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0, (3 * x + 5 * y + 11 * f + seed) % 256)
                x += 1
              }
              y += 1
            }
            // interlace OFF, explicitly: the JDK gif writer's default
            // INTERLACED row schedule mis-writes heights where an
            // interlace pass lands empty (found: every h = 4 frame came
            // back with row y = 2 missing) — sequential row order
            // round-trips bit-exactly at every size
            val meta = writer.getDefaultImageMetadata(
              new javax.imageio.ImageTypeSpecifier(img), null)
            val fmt = meta.getNativeMetadataFormatName
            val root = meta.getAsTree(fmt)
              .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            var i = 0
            while (i < root.getLength) {
              if (root.item(i).getNodeName == "ImageDescriptor")
                root.item(i).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
                  .setAttribute("interlaceFlag", "FALSE")
              i += 1
            }
            meta.setFromTree(fmt, root)
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
            f += 1
          }
          writer.endWriteSequence()
          out.close()
          GifPayload(id, buf.toByteArray)
        }
      }
  }

  /** REAL frame-sampling EXECUTION — the per-frame decode work
    * [[frameSamplePlan]] only sizes: open each animated container, count
    * its frames from the stream (`getNumImages`), decode every
    * `stride`-th frame, and census the SAMPLED frames' exact gray sums.
    * `sampled_frames` realizes the plan's `floor((frames−1)/stride) + 1`
    * by actual decode count; the skipped frames are never rasterized —
    * the bandwidth economics of video-style sampling. Reader handle per
    * partition (GIF needs `seekForwardOnly = false` for the frame
    * count). */
  def frameSampleExec(media: Dataset[GifPayload], stride: Int = 2): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val reader = {
        val rs = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
        require(rs.hasNext, "no GIF reader in this JDK")
        rs.next()
      }
      it.map { rec =>
        val in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(rec.payload))
        reader.setInput(in, false, true)
        val frames = reader.getNumImages(true)
        var (f, sampled, sum) = (0, 0L, 0L)
        var (w, h) = (0L, 0L)
        while (f < frames) {
          val img = reader.read(f)
          if (f == 0) { w = img.getWidth.toLong; h = img.getHeight.toLong }
          val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
          var i = 0
          while (i < px.length) { sum += px(i) & 0xff; i += 1 }
          sampled += 1
          f += stride
        }
        in.close()
        FrameCensus(rec.media_id, frames.toLong, sampled, w, h, sum)
      }
    }.toDF().orderBy(col("media_id"))
  }

  /** Per-image luminance features over REAL decoded pixels. */
  case class ImageFeatures(media_id: Long, width: Long, height: Long,
                           lum_sum: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** Image FEATURE extraction at census grain — the pixel-statistics stage
    * an image curation pipeline runs after decode (exposure/contrast
    * screens, dark/blank frame detection): per image, over the
    * `javax.imageio`-decoded raster, integer luminance `⌊(r+g+b)/3⌋` per
    * pixel, reported as the exact luminance sum plus a 4-bin histogram
    * (64-wide bins — the shadows/low-mid/high-mid/highlights split). All
    * integer arithmetic of decoded pixel bytes, so the oracle recomputes
    * every output from [[pngMedia]]'s closed form — agreement proves decode
    * AND feature fold. Same per-partition reader-handle economics as
    * [[decodeImageCensus]]; only 8 longs per image ever shuffle. */
  def imageFeatureCensus(media: Dataset[PngPayload]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val reader = pngReaderHandle()
      it.map { rec =>
        val img = decodePng(reader, rec.payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val bins = new Array[Long](4)
        var (i, lumSum) = (0, 0L)
        while (i < px.length) {
          val p = px(i)
          val lum = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
          lumSum += lum
          bins(lum >> 6) += 1
          i += 1
        }
        ImageFeatures(rec.media_id, w.toLong, h.toLong, lumSum,
          bins(0), bins(1), bins(2), bins(3))
      }
    }.toDF().orderBy(col("media_id"))
  }

  /** An opaque audio payload: id + WAV bytes, nothing else. */
  case class WavPayload(media_id: Long, payload: Array[Byte])

  /** Per-clip decode census: format fields and the EXACT integer sample
    * sum, all read from the decoded PCM stream. */
  case class AudioCensus(media_id: Long, frames: Long, channels: Long,
                         sample_rate: Long, bits: Long, sum_samples: Long)

  /** Deterministic WAV fixtures — the audio sibling of [[pngMedia]]: one
    * real RIFF/WAVE file per document (16-bit signed PCM little-endian,
    * mono, 8 kHz), written with the JDK's own `javax.sound.sampled`.
    * Frame count and samples are a closed-form of `doc_id`:
    *
    *   frames = 16 + id % 241,  seed = id % 9973
    *   sample(i) = ((1103·i + seed) mod 65536) − 32768
    *
    * WAV PCM is lossless, so [[decodeAudioCensus]] agreeing with the
    * formula proves the encode→decode round-trip exact to the sample. */
  def wavMedia(docs: DataFrame): Dataset[WavPayload] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.where(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long")).as[Long]
      // id-only fan-out ahead of the codec stage — see [[pngMedia]]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        // the WAVE SPI writer resolved once per partition — the static
        // AudioSystem.write path runs a globally-synchronized provider
        // lookup per call (see the codec-handle section)
        val writer = wavWriterHandle()
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        it.map { id =>
          val n = (16L + id % 241L).toInt
          val seed = (id % 9973L).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = ((1103 * i + seed) % 65536) - 32768
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream(n * 2 + 64)
          writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          WavPayload(id, bos.toByteArray)
        }
      }
  }

  /** REAL audio decode at census grain: `javax.sound.sampled` parses each
    * RIFF payload back to its PCM stream; the census reports the decoded
    * frame count, format fields, and the exact integer sample sum — the
    * quantities the oracle recomputes from [[wavMedia]]'s closed form.
    * Same partition-iterator economics as [[decodeImageCensus]]. */
  def decodeAudioCensus(media: Dataset[WavPayload]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // reader probed on the first payload, reused for the partition (all
      // payloads share one container format)
      var reader: javax.sound.sampled.spi.AudioFileReader = null
      it.map { rec =>
        if (reader == null) reader = wavReaderHandle(rec.payload)
        val ais = reader.getAudioInputStream(
          new java.io.ByteArrayInputStream(rec.payload))
        val fmt = ais.getFormat
        require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          && fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"media_id=${rec.media_id}: unexpected decoded format $fmt")
        val bytes = ais.readAllBytes()
        var (i, sum) = (0, 0L)
        while (i + 1 < bytes.length) {
          sum += ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
          i += 2
        }
        AudioCensus(rec.media_id, ais.getFrameLength, fmt.getChannels.toLong,
          fmt.getSampleRate.toLong, fmt.getSampleSizeInBits.toLong, sum)
      }
    }.toDF().orderBy(col("media_id"))
  }

  /** Per-clip windowed audio features over REAL decoded PCM. */
  case class AudioFeatures(media_id: Long, frames: Long, n_windows: Long,
                           zero_crossings: Long, energy: Long,
                           max_window_energy: Long)

  /** Audio FEATURE extraction at census grain — the signal-level stage an
    * audio curation pipeline runs after decode (silence/clipping detection,
    * speech-band activity proxies): per clip, over the `javax.sound`-decoded
    * PCM stream, exact integer
    *  - zero-crossing count (sign changes across consecutive samples,
    *    `s < 0` vs `s ≥ 0`),
    *  - total energy Σ s² (16-bit samples square below 2³⁰ — exact in a
    *    long at any clip length that fits memory),
    *  - per-`window`-sample energy, reported as the max window (the
    *    loudest-burst statistic).
    * All quantities are integers of the decoded samples, so the oracle
    * recomputes them from [[wavMedia]]'s closed form — agreement proves the
    * decode AND the feature fold, not just the byte round-trip. Same
    * per-partition codec-handle economics as [[decodeAudioCensus]]. */
  def audioFeatureCensus(media: Dataset[WavPayload], window: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      var reader: javax.sound.sampled.spi.AudioFileReader = null
      it.map { rec =>
        if (reader == null) reader = wavReaderHandle(rec.payload)
        val ais = reader.getAudioInputStream(
          new java.io.ByteArrayInputStream(rec.payload))
        val fmt = ais.getFormat
        require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          && fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"media_id=${rec.media_id}: unexpected decoded format $fmt")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var (i, zc, energy, wEnergy, maxW) = (0, 0L, 0L, 0L, 0L)
        var prevNeg = false
        while (i < n) {
          val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
          val neg = s < 0
          if (i > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          energy += s * s
          wEnergy += s * s
          if ((i + 1) % window == 0 || i + 1 == n) {
            if (wEnergy > maxW) maxW = wEnergy
            wEnergy = 0L
          }
          i += 1
        }
        AudioFeatures(rec.media_id, n.toLong, ((n + window - 1) / window).toLong,
          zc, energy, maxW)
      }
    }.toDF().orderBy(col("media_id"))
  }

  /** Synthesize a media table from the documents table (text bytes as opaque
    * payload) — stand-in for `spark.read.format("binaryFile")` at scale. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** The decode/feature-extract stage: mapPartitions so the decoder is
    * instantiated once per partition (per task), mirroring Arrow-batch UDF
    * economics. Returns a typed Dataset with the metadata schema. */
  def decodeAll(media: DataFrame, decoder: MediaDecoder = DeterministicFakeDecoder): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val d = decoder // per-partition init point (open codec handles here)
      it.map(d.decode)
    }
  }

  /** Extracted feature vector per media row (the embedding-production stage
    * of a multimodal pipeline; a real implementation would run the codec +
    * a vision/audio encoder here). */
  case class MediaFeatures(media_id: Long, kind: String, features: Array[Double])

  /** Feature extraction via mapPartitions: the MessageDigest — stand-in for
    * a codec/encoder handle — is instantiated once per partition and reused
    * across rows (digest() resets it), the economics that matter when the
    * per-row work is a model forward pass. The 8 components are 12-bit
    * windows of the payload's md5, scaled to [0,1) — a pure function of the
    * bytes that any SQL engine reproduces from its md5() hex output, so the
    * whole stage is oracle-checkable. */
  def featureVectors(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
      it.map { r =>
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        val fs = Array.tabulate(8)(j =>
          java.lang.Long.parseLong(hex.substring(j * 3, j * 3 + 3), 16) / 4096.0)
        MediaFeatures(r.media_id, r.kind, fs)
      }
    }
  }

  /** Per-kind feature profile: count and mean feature-vector L2 norm. The
    * per-row norm is floor-quantized to exact 1e-4-unit longs before the
    * group sum, so the means are aggregation-order independent. */
  def featureProfile(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    featureVectors(media)
      .select(col("media_id"), col("kind"),
        floor(graft.plans.VectorExpressions.fvecNorm(col("features")) * 10000.0).as("norm_u"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Cols.avg4(sum(col("norm_u")).cast("double") / 10000.0,
          count(lit(1))).as("mean_feature_norm"))
      .orderBy(col("kind"))
  }

  /** Frame-sample plan: per video, how many frames survive taking every
    * `stride`-th index starting at 0 — the SIZING stage ahead of per-frame
    * decode in a video pipeline (partition budgets, progress accounting).
    * The exploded per-frame work list is one projection away
    * (`explode(sequence(0, frames - 1, stride))` on this output), which is
    * where decode parallelism fans out; this operator stays a count so it
    * aggregates (and oracle-checks) without materializing a row per frame. */
  def frameSamplePlan(media: DataFrame, stride: Int = 30): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    decodeAll(media).where(col("kind") === "video")
      .select(col("media_id"), col("frames").cast("long").as("frames"),
        (floor((col("frames") - 1) / stride) + 1).as("sampled_frames"))
      .orderBy(col("media_id"))
  }

  /** Resize plan: fit each frame inside `maxW`×`maxH` preserving aspect
    * ratio, via INTEGER-exact arithmetic (the bound side is chosen by
    * cross-multiplying, the scaled side floors — no float ratios, so any
    * engine agrees on every output dimension). The pixel work belongs to
    * the decoder; this is the planning stage that sizes buffers and
    * shuffle volume before it. */
  def resizePlan(media: DataFrame, maxW: Int = 256, maxH: Int = 256): DataFrame = {
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    val fits = w <= maxW && h <= maxH
    // width-bound iff maxW/w <= maxH/h  ⟺  maxW*h <= maxH*w
    val widthBound = lit(maxW.toLong) * h <= lit(maxH.toLong) * w
    decodeAll(media)
      .select(col("media_id"), col("kind"), w.as("width"), h.as("height"),
        when(fits, w).otherwise(when(widthBound, lit(maxW.toLong))
          .otherwise(floor(w * maxH / h))).as("out_w"),
        when(fits, h).otherwise(when(widthBound, floor(h * maxW / w))
          .otherwise(lit(maxH.toLong))).as("out_h"))
      .orderBy(col("media_id"))
  }

  /** Metadata profile per kind — the downstream aggregate a pipeline would
    * use for partitioning decisions (e.g. bytes per partition budget). */
  def mediaProfile(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    decodeAll(media).groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        max(col("width")).cast("long").as("max_width"),
        max(col("frames")).cast("long").as("max_frames"))
      .orderBy(col("kind"))
  }

  /** Content-addressable-storage audit: exact binary dedup of the payload
    * column by digest. The scan projects (kind, md5(payload), length) — the
    * payload itself is NEVER shuffled; at 100 TB of media the digest+length
    * pair (≈40 bytes) is what moves, which is the whole point of
    * content-addressing. Per kind: logical vs unique object counts/bytes
    * and the byte savings a CAS landing (or a dedup-before-decode stage)
    * would bank. `md5` on binary is codegen'd and identical to any SQL
    * engine's digest of the same bytes, so the audit is oracle-exact. */
  def casAudit(media: DataFrame): DataFrame = {
    val objects = media
      .select(col("kind"), md5(col("payload")).as("digest"),
        length(col("payload")).cast("long").as("bytes"))
      .groupBy(col("kind"), col("digest"))
      .agg(count(lit(1)).as("copies"), max(col("bytes")).as("bytes"))
    objects.groupBy(col("kind"))
      .agg(
        sum(col("copies")).as("logical_objects"),
        count(lit(1)).as("unique_objects"),
        graft.functions.Cols.countWhen(col("copies") > 1).as("duplicated_objects"),
        max(col("copies")).as("max_copies"),
        sum(col("copies") * col("bytes")).as("logical_bytes"),
        sum(col("bytes")).as("unique_bytes"),
        sum((col("copies") - 1) * col("bytes")).as("saved_bytes"))
      .orderBy(col("kind"))
  }
}
