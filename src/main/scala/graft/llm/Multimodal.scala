package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** Multimodal column plumbing: media as opaque `binary` + typed metadata,
  * with decode/feature-extraction as a batched per-partition stage (the Scala
  * analog of a `mapInPandas` decode). The Spark-side contract — schema,
  * partition-level batching, feature row shape — is real and tested; the
  * codec itself is a SEAM: [[Codec.decode]] is a deterministic stand-in
  * (byte stats) because no image/audio library ships in this build. A real
  * deployment swaps in JPEG/PNG/audio decoding behind the same signature.
  *
  * Scale shape: decode runs inside `mapPartitions` (one codec init per
  * partition, streaming over rows — no per-row setup, no collect); binary
  * payloads never shuffle (features are extracted before any aggregation).
  */
object Multimodal {

  /** One media row: id + opaque payload + declared mime. */
  final case class MediaRow(id: Long, media: Array[Byte], mime: String)

  /** Output row of [[thumbnailDF]]: true source dims + the row-major
    * nearest-neighbor luminance thumbnail. */
  final case class ThumbRow(id: Long, width: Int, height: Int, thumb: Seq[Int])

  /** Output row of [[audioResampleDF]]: source rate/frame-count + the
    * fixed-length nearest-neighbor first-channel resample. */
  final case class ResampleRow(id: Long, sample_rate: Int, n_frames: Long,
                               samples: Seq[Int])

  /** Extracted features — fixed, small, shuffle-friendly. */
  final case class MediaFeatures(
      id: Long,
      n_bytes: Long,
      head_byte: Int,
      checksum: Long,
      n_frames: Long
  )

  /** The codec seam. Deterministic byte-level "decode": size, first byte,
    * additive checksum, fake frame count (1 frame per 256-byte block).
    */
  object Codec {
    val FRAME_BYTES = 256L

    def decode(media: Array[Byte]): MediaFeatures = {
      var sum = 0L
      var i = 0
      while (i < media.length) { sum += media(i) & 0xff; i += 1 }
      MediaFeatures(
        id = -1L,
        n_bytes = media.length.toLong,
        head_byte = if (media.isEmpty) -1 else media(0) & 0xff,
        checksum = sum,
        n_frames = (media.length + FRAME_BYTES - 1) / FRAME_BYTES
      )
    }
  }

  /** Batched decode over a media dataset: one codec "session" per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition codec init would go here (native lib handles etc.)
      rows.map(r => Codec.decode(r.media).copy(id = r.id))
    }
  }

  /** DataFrame-friendly wrapper: (id: long, media: binary, mime: string). */
  def extractFeaturesDF(spark: SparkSession, df: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[MediaRow]
    extractFeatures(df.selectExpr("id", "media", "mime").as[MediaRow]).toDF()
  }

  // ---------------------------------------------------------------------
  // Real container parsing (no image/audio libraries required): the codec
  // seam above extracts byte stats; METADATA extraction — dimensions, bit
  // depth, channels, sample counts — only needs the container headers,
  // which are fully parseable in pure JVM code. PNG/JPEG/GIF/BMP images
  // and RIFF/WAVE audio are covered; unknown payloads degrade to "raw".
  // ---------------------------------------------------------------------

  /** Container-level media metadata; -1 marks fields the format lacks
    * (e.g. sample_rate for an image). Fixed-width and tiny: safe to shuffle
    * and aggregate at corpus scale while the payloads stay put.
    */
  final case class MediaMeta(
      id: Long,
      format: String,
      width: Int,
      height: Int,
      bit_depth: Int,
      n_channels: Int,
      sample_rate: Int,
      n_samples: Long
  )

  /** Magic-byte dispatch + per-format header parsers. Parsers are defensive:
    * truncated/corrupt containers degrade to the "raw" fallback rather than
    * throwing (a 100 TB media crawl ALWAYS contains malformed files).
    */
  object Probe {

    private val RAW = MediaMeta(-1L, "raw", -1, -1, -1, -1, -1, -1L)

    def probe(b: Array[Byte]): MediaMeta =
      try {
        if (isPng(b)) png(b)
        else if (isJpeg(b)) jpeg(b)
        else if (isGif(b)) gif(b)
        else if (isBmp(b)) bmp(b)
        else if (isWav(b)) wav(b)
        else if (isMp4(b)) mp4(b)
        else if (isAvi(b)) avi(b)
        else RAW
      } catch { case _: Exception => RAW }

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def u32be(b: Array[Byte], i: Int): Long =
      ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL
    private def u32le(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)) & 0xffffffffL

    private def isPng(b: Array[Byte]) = b.length > 33 &&
      u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a

    /** IHDR is mandated to be the first chunk (PNG spec §11.2.2). */
    private def png(b: Array[Byte]): MediaMeta = {
      require(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R', "IHDR not first")
      val colorType = u8(b, 25)
      val channels = colorType match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => -1
      }
      MediaMeta(-1L, "png", u32be(b, 16).toInt, u32be(b, 20).toInt,
        u8(b, 24), channels, -1, -1L)
    }

    private def isJpeg(b: Array[Byte]) = b.length > 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

    /** Walk marker segments to the first SOF0/1/2 frame header. */
    private def jpeg(b: Array[Byte]): MediaMeta = {
      var i = 2
      while (i + 4 < b.length) {
        if (u8(b, i) != 0xff) throw new IllegalArgumentException("bad marker")
        val m = u8(b, i + 1)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone
        else {
          val len = u16be(b, i + 2)
          if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
            // SOF: precision(1) height(2) width(2) nComponents(1)
            return MediaMeta(-1L, "jpeg", u16be(b, i + 7), u16be(b, i + 5),
              u8(b, i + 4), u8(b, i + 9), -1, -1L)
          }
          if (m == 0xda) throw new IllegalArgumentException("SOS before SOF") // scan data
          i += 2 + len
        }
      }
      throw new IllegalArgumentException("no SOF")
    }

    private def isGif(b: Array[Byte]) = b.length > 10 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

    private def gif(b: Array[Byte]): MediaMeta = {
      val colorRes = ((u8(b, 10) >> 4) & 0x7) + 1 // bits per primary
      MediaMeta(-1L, "gif", u16le(b, 6), u16le(b, 8), colorRes, 3, -1, -1L)
    }

    private def isBmp(b: Array[Byte]) = b.length > 30 && b(0) == 'B' && b(1) == 'M'

    private def bmp(b: Array[Byte]): MediaMeta = {
      val bpp = u16le(b, 28)
      MediaMeta(-1L, "bmp", u32le(b, 18).toInt, math.abs(u32le(b, 22).toInt),
        bpp, math.max(1, bpp / 8), -1, -1L)
    }

    private def isWav(b: Array[Byte]) = b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    /** Walk RIFF sub-chunks for fmt (PCM layout) and data (sample count).
      * Long cursor + monotonic-advance guard: a corrupt 32-bit chunk length
      * (e.g. 0xFFFFFFF8, which would advance the cursor by exactly 0) must
      * degrade to "raw" via the probe's catch, never hang the executor.
      */
    private def wav(b: Array[Byte]): MediaMeta = {
      var i = 12L
      var channels = -1; var rate = -1; var bits = -1; var blockAlign = -1
      var nSamples = -1L
      while (i + 8 <= b.length) {
        val ii = i.toInt
        val id = new String(b, ii, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val len = u32le(b, ii + 4) // 0..2^32-1, never negative as Long
        if (id == "fmt ") {
          channels = u16le(b, ii + 10)
          rate = u32le(b, ii + 12).toInt
          blockAlign = u16le(b, ii + 20)
          bits = u16le(b, ii + 22)
        } else if (id == "data" && blockAlign > 0) {
          nSamples = len / blockAlign
        }
        i += 8L + len + (len & 1L) // word-aligned; strictly increasing
      }
      require(rate > 0, "no fmt chunk")
      MediaMeta(-1L, "wav", -1, -1, bits, channels, rate, nSamples)
    }

    private def isMp4(b: Array[Byte]) = b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

    /** ISO BMFF (MP4) box walk — public ISO/IEC 14496-12 layout. Reads the
      * movie header (`moov`/`mvhd` v0: timescale + duration in timescale
      * units) and the first track header with nonzero dimensions
      * (`trak`/`tkhd` v0: width/height as 16.16 fixed point). Field
      * mapping: sample_rate = timescale, n_samples = duration units —
      * duration seconds = n_samples / sample_rate, same convention as WAV.
      * Frame-accurate counts live in `stts` sample tables, deliberately out
      * of scope for a header probe.
      */
    private def mp4(b: Array[Byte]): MediaMeta = {
      var w = -1; var h = -1; var timescale = -1; var duration = -1L

      def walk(from: Long, to: Long, depth: Int): Unit = {
        var i = from
        while (i + 8 <= to && depth < 8) {
          val ii = i.toInt
          var size = u32be(b, ii)
          val typ = new String(b, ii + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
          if (size == 1L) return // 64-bit largesize: beyond a header probe
          if (size == 0L) size = to - i // box extends to EOF
          require(size >= 8, "bad box size")
          typ match {
            case "moov" | "trak" => walk(i + 8, math.min(to, i + size), depth + 1)
            case "mvhd" if u8(b, ii + 8) == 0 => // version 0 layout
              timescale = u32be(b, ii + 20).toInt
              duration = u32be(b, ii + 24)
            case "tkhd" if u8(b, ii + 8) == 0 && w <= 0 =>
              // v0: fullbox(4) ctime(4) mtime(4) id(4) res(4) dur(4)
              // res(8) layer(2) group(2) vol(2) res(2) matrix(36) w(4) h(4)
              val tw = (u32be(b, ii + 84) >> 16).toInt
              val th = (u32be(b, ii + 88) >> 16).toInt
              if (tw > 0 && th > 0) { w = tw; h = th }
            case _ =>
          }
          i += size
        }
      }
      walk(0L, b.length.toLong, 0)
      require(timescale > 0, "no mvhd")
      MediaMeta(-1L, "mp4", w, h, -1, -1, timescale, duration)
    }

    private def isAvi(b: Array[Byte]) = b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

    /** RIFF AVI main header (`avih`, OpenDML/public msdn layout): frame
      * period, total frames, dimensions. Field mapping: n_samples = total
      * frames, sample_rate = frames/sec rounded from dwMicroSecPerFrame.
      * The avih chunk nests inside LIST/hdrl — the walk descends LIST
      * chunks with the same corrupt-length guard as [[wav]].
      */
    private def avi(b: Array[Byte]): MediaMeta = {
      var out: MediaMeta = null

      def walk(from: Long, to: Long, depth: Int): Unit = {
        var i = from
        while (i + 8 <= to && depth < 8 && out == null) {
          val ii = i.toInt
          val id = new String(b, ii, 4, java.nio.charset.StandardCharsets.US_ASCII)
          val len = u32le(b, ii + 4)
          if (id == "LIST") walk(i + 12, math.min(to, i + 8 + len), depth + 1)
          else if (id == "avih" && len >= 40) {
            val usPerFrame = u32le(b, ii + 8)
            val totalFrames = u32le(b, ii + 24)
            val w = u32le(b, ii + 40).toInt
            val h = u32le(b, ii + 44).toInt
            val fps = if (usPerFrame > 0) math.round(1e6 / usPerFrame).toInt else -1
            out = MediaMeta(-1L, "avi", w, h, -1, -1, fps, totalFrames)
          }
          i += 8L + len + (len & 1L)
        }
      }
      walk(12L, b.length.toLong, 0)
      require(out != null, "no avih")
      out
    }
  }

  /** Batched metadata probe — same per-partition batching contract as
    * [[extractFeatures]]; payload bytes never leave the partition.
    */
  def probeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    media.mapPartitions { rows =>
      rows.map(r => Probe.probe(r.media).copy(id = r.id))
    }
  }

  /** One sampled video frame: container id, frame index, decoded frame
    * payload. Fixed schema regardless of codec.
    */
  final case class FrameRow(id: Long, frame_idx: Long, width: Int, height: Int,
                            frame: Array[Byte])

  /** Video frame sampling — every `everyNth` frame of each container,
    * enumerated from the HEADER's frame count (AVI total frames; MP4
    * duration x 30 fps nominal — header-level, like the probe). The Spark
    * shape is the real one: per-partition batching, payload bytes never
    * shuffle (frames are emitted where the container bytes live), fixed
    * output schema, frame count bounded by `maxFrames` so one long video
    * cannot blow up a task.
    *
    * THE PIXEL DECODE IS A DETERMINISTIC STUB: the JDK ships no video
    * codec, so `frame` is a reproducible function of (id, frame_idx) —
    * grayscale w x h bytes, value (id + 31*frame_idx + pixel) mod 256 —
    * NOT real pixel data. A production deployment swaps [[stubFrame]] for
    * a JNI/ffmpeg binding with the same signature; everything around it
    * (schema, batching, bounds, downstream feature extraction) is real and
    * tested.
    */
  def sampleVideoFrames(media: Dataset[MediaRow], everyNth: Int = 30,
                        maxFrames: Int = 64): Dataset[FrameRow] = {
    require(everyNth > 0, "everyNth must be positive")
    implicit val enc = Encoders.product[FrameRow]
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val meta = Probe.probe(r.media)
        val nFrames: Long = meta.format match {
          case "avi" => math.max(0L, meta.n_samples)
          case "mp4" if meta.sample_rate > 0 =>
            // header gives duration, not frames; 30 fps nominal
            math.max(0L, meta.n_samples * 30L / meta.sample_rate)
          case _ => 0L
        }
        // headers LIE in a crawl corpus: clamp dimensions so a claimed
        // 50000x50000 container can neither overflow w*h to a negative
        // allocation nor demand gigabytes per frame — malformed containers
        // degrade (here: to clamped stub frames), never throw
        val w = math.min(4096, math.max(1, meta.width))
        val h = math.min(4096, math.max(1, meta.height))
        // iterator: ONE frame payload alive at a time per input row, not
        // maxFrames of them materialized in a strict Seq
        (0L until nFrames by everyNth.toLong).iterator.take(maxFrames).map { fi =>
          FrameRow(r.id, fi, w, h, stubFrame(r.id, fi, w, h))
        }
      }
    }
  }

  /** The clearly-marked decode stub (see [[sampleVideoFrames]]). */
  private def stubFrame(id: Long, frameIdx: Long, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    var p = 0
    while (p < out.length) {
      out(p) = ((id + 31L * frameIdx + p) & 0xff).toByte
      p += 1
    }
    out
  }

  // ---------------------------------------------------------------------
  // Real decode (no external libraries): JDK ImageIO covers PNG/JPEG/GIF/
  // BMP pixels, JDK AudioSystem covers WAV samples. This closes the codec
  // seam for the formats the JDK ships decoders for; exotic codecs still
  // plug in behind the same [[decodeMedia]] signature.
  // ---------------------------------------------------------------------

  /** Decoded (pixel/sample-level) features; -1 marks fields the media kind
    * lacks. Fixed-width and tiny — decode happens where the bytes live, only
    * these features ever shuffle.
    *
    * The 64-bit perceptual hash travels as two non-negative longs
    * (`phash_hi` = bits 32-63, `phash_lo` = bits 0-31) so SQL engines
    * without unsigned 64-bit shifts can recompute it exactly;
    * [[imageNearDupPairs]] recombines them for hamming machinery.
    */
  final case class DecodedMedia(
      id: Long,
      kind: String, // "image" | "audio" | "unknown"
      width: Int,
      height: Int,
      mean_lum: Double,
      phash_hi: Long,
      phash_lo: Long,
      n_samples: Long,
      sample_rate: Int,
      rms: Double,
      duration_s: Double
  )

  object Decode {

    private val UNKNOWN =
      DecodedMedia(-1L, "unknown", -1, -1, -1d, -1L, -1L, -1L, -1, -1d, -1d)

    /** Full decode with magic-byte dispatch (images via ImageIO, RIFF/WAVE
      * via AudioSystem); malformed payloads degrade to "unknown" — a media
      * crawl always contains corrupt files, and one of them must cost a row,
      * not a stage retry.
      */
    def decode(media: Array[Byte]): DecodedMedia =
      try {
        if (media.length >= 12 &&
          media(0) == 'R' && media(1) == 'I' && media(2) == 'F' && media(3) == 'F' &&
          media(8) == 'W' && media(9) == 'A' && media(10) == 'V' && media(11) == 'E')
          audio(media)
        else image(media)
      } catch { case _: Exception => UNKNOWN }

    /** Image decode: true dimensions from pixels, mean luminance, and a
      * 64-bit average-hash (aHash): nearest-neighbor 8x8 downsample of the
      * luminance plane, bit k = [sample_k > mean of the 64 samples]. All
      * integer pixel arithmetic — bit-for-bit reproducible by any engine
      * that can read the same pixels.
      */
    def image(media: Array[Byte]): DecodedMedia = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
      if (img == null) return UNKNOWN
      val w = img.getWidth
      val h = img.getHeight
      val lum = luminancePlane(img)
      var sum = 0L
      var i = 0
      while (i < lum.length) { sum += lum(i); i += 1 }
      val phash = aHash64(lum, w, h)
      DecodedMedia(-1L, "image", w, h, sum.toDouble / (w.toLong * h),
        phash >>> 32, phash & 0xffffffffL, -1L, -1, -1d, -1d)
    }

    /** Luminance (0-255) per pixel, row-major. Single-band rasters
      * (grayscale) read the band EXACTLY; multi-band goes through the
      * integer ITU-R 601 weights (299r + 587g + 114b) / 1000 — deterministic
      * integer arithmetic, no float rounding.
      */
    private[llm] def luminancePlane(img: java.awt.image.BufferedImage): Array[Int] = {
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      if (raster.getNumBands == 1) {
        // one bulk band read — same values as per-pixel getSample
        raster.getSamples(0, 0, w, h, 0, new Array[Int](w * h))
      } else {
        // one bulk ARGB read (same ColorModel conversion as per-pixel
        // getRGB, so hashes are unchanged), then integer luminance in place
        val out = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        while (i < out.length) {
          val rgb = out(i)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          out(i) = (299 * r + 587 * g + 114 * b) / 1000
          i += 1
        }
        out
      }
    }

    /** 64-bit aHash over a luminance plane: sample s(j,i) =
      * lum[(j*h)/8][(i*w)/8] (nearest-neighbor — exact integer index
      * arithmetic, works for images smaller than 8x8 too), mean over the 64
      * samples, bit (j*8+i) set iff its sample is STRICTLY above the mean.
      */
    private[llm] def aHash64(lum: Array[Int], w: Int, h: Int): Long = {
      val s = new Array[Int](64)
      var k = 0
      while (k < 64) {
        val y = ((k / 8) * h) / 8
        val x = ((k % 8) * w) / 8
        s(k) = lum(y * w + x)
        k += 1
      }
      var sum = 0L
      k = 0
      while (k < 64) { sum += s(k); k += 1 }
      val mean = sum / 64.0
      var hash = 0L
      k = 0
      while (k < 64) {
        if (s(k) > mean) hash |= (1L << k)
        k += 1
      }
      hash
    }

    /** Nearest-neighbor thumbnail of the luminance plane — [[aHash64]]'s
      * index arithmetic at arbitrary target dims: sample (yo, xo) =
      * lum[(yo*h)/th][(xo*w)/tw], row-major. The pre-feature RESIZE every
      * image pipeline runs, in exact integer arithmetic (no interpolation
      * floats), so any engine that can read the same pixels reproduces the
      * thumbnail bit-for-bit. Works for sources smaller than the target
      * (indices stay in [0, w) x [0, h)). Malformed payloads return None —
      * a media crawl always contains corrupt files.
      */
    def thumbnail(media: Array[Byte], tw: Int, th: Int): Option[(Int, Int, Array[Int])] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val lum = luminancePlane(img)
          val out = new Array[Int](tw * th)
          var yo = 0
          while (yo < th) {
            val y = (yo * h) / th
            var xo = 0
            while (xo < tw) {
              out(yo * tw + xo) = lum(y * w + (xo * w) / tw)
              xo += 1
            }
            yo += 1
          }
          Some((w, h, out))
        }
      } catch { case _: Exception => None }

    /** Audio decode via AudioSystem: frame count, rate, RMS amplitude,
      * duration. Accepts 8/16/24-bit integer PCM (signed or unsigned — WAV's
      * unsigned 8-bit reads with its 2^(bits-1) offset removed so silence is
      * 0 at every depth), any channel count and endianness. Semantics,
      * stated precisely: `n_samples` counts FRAMES (one per sample period,
      * all channels together — what duration is made of); `rms` is the
      * root-mean-square over ALL samples of ALL channels, in raw integer
      * sample units of the source bit depth — for multi-channel audio this
      * equals the standard sqrt(mean over channels of the per-channel mean
      * square), for mono it is the per-channel RMS. Anything else (float
      * PCM, compressed codecs, a malformed rate of 0) degrades to "unknown",
      * never to Infinity/NaN fields.
      */
    def audio(media: Array[Byte]): DecodedMedia = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(media))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val rate = math.round(fmt.getSampleRate).toInt
        if ((!unsigned && enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) ||
          (bits != 8 && bits != 16 && bits != 24) || rate <= 0) return UNKNOWN
        val bytes = in.readAllBytes()
        val bytesPer = bits / 8
        val big = fmt.isBigEndian
        val n = bytes.length / bytesPer
        var sumSq = 0.0
        var i = 0
        while (i < n) {
          val off = i * bytesPer
          var v = 0
          if (big) {
            var j = 0
            while (j < bytesPer) { v = (v << 8) | (bytes(off + j) & 0xff); j += 1 }
          } else {
            var j = bytesPer - 1
            while (j >= 0) { v = (v << 8) | (bytes(off + j) & 0xff); j -= 1 }
          }
          val s = if (unsigned) v - (1 << (bits - 1))
                  else (v << (32 - bits)) >> (32 - bits) // sign-extend
          sumSq += s.toDouble * s
          i += 1
        }
        val frames = n / math.max(1, fmt.getChannels)
        DecodedMedia(-1L, "audio", -1, -1, -1d, -1L, -1L,
          frames.toLong, rate,
          if (n == 0) 0d else math.sqrt(sumSq / n),
          frames.toDouble / rate)
      } finally in.close()
    }

    /** One PCM sample (integer, sign- or offset-corrected) at byte `off` —
      * the decode loop above, factored for reuse by [[audioResample]]. */
    private def pcmSample(bytes: Array[Byte], off: Int, bytesPer: Int,
                          big: Boolean, unsigned: Boolean, bits: Int): Int = {
      var v = 0
      if (big) {
        var j = 0
        while (j < bytesPer) { v = (v << 8) | (bytes(off + j) & 0xff); j += 1 }
      } else {
        var j = bytesPer - 1
        while (j >= 0) { v = (v << 8) | (bytes(off + j) & 0xff); j -= 1 }
      }
      if (unsigned) v - (1 << (bits - 1))
      else (v << (32 - bits)) >> (32 - bits) // sign-extend
    }

    /** Nearest-neighbor audio RESAMPLE to a fixed length — [[thumbnail]]'s
      * index arithmetic on the time axis: out(i) = frame[(i·frames) div k]
      * of the FIRST channel, exact integer index math (no interpolation),
      * so any engine that can read the same samples reproduces the output
      * bit-for-bit. The fixed-length downsample every audio pipeline runs
      * before feature extraction/fingerprinting. Same PCM envelope as
      * [[audio]] (8/16/24-bit integer, any endianness); anything else, or
      * a malformed payload, returns None.
      */
    def audioResample(media: Array[Byte], k: Int): Option[(Int, Long, Array[Int])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(media))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val bits = fmt.getSampleSizeInBits
          val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val rate = math.round(fmt.getSampleRate).toInt
          if ((!unsigned && enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) ||
            (bits != 8 && bits != 16 && bits != 24) || rate <= 0) return None
          val bytes = in.readAllBytes()
          val bytesPer = bits / 8
          val big = fmt.isBigEndian
          val channels = math.max(1, fmt.getChannels)
          val frames = (bytes.length / bytesPer) / channels
          if (frames == 0) return Some((rate, 0L, Array.empty[Int]))
          val out = new Array[Int](k)
          var i = 0
          while (i < k) {
            val f = ((i.toLong * frames) / k).toInt
            out(i) = pcmSample(bytes, f * channels * bytesPer, bytesPer, big, unsigned, bits)
            i += 1
          }
          Some((rate, frames.toLong, out))
        } finally in.close()
      } catch { case _: Exception => None }
  }

  /** Batched REAL decode — same per-partition contract as
    * [[extractFeatures]]: one decoder session per partition (ImageIO's disk
    * cache is disabled once per partition — executor-local temp files are
    * wasted IO for in-memory payloads), payload bytes never leave it.
    */
  def decodeMedia(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    implicit val enc = Encoders.product[DecodedMedia]
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(r => Decode.decode(r.media).copy(id = r.id))
    }
  }

  /** DataFrame-friendly wrapper: (id: long, media: binary, mime: string). */
  def decodeMediaDF(spark: SparkSession, df: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[MediaRow]
    decodeMedia(df.selectExpr("id", "media", "mime").as[MediaRow]).toDF()
  }

  /** Batched nearest-neighbor RESIZE over a media frame — the decode +
    * integer-NN thumbnail ([[Decode.thumbnail]]) per partition, payload
    * bytes never leaving it; undecodable rows drop (flatMap), the q46
    * corrupt-file contract. Input: (id: long, media: binary, mime: string).
    */
  def thumbnailDF(df: DataFrame, tw: Int, th: Int): DataFrame = {
    implicit val encIn = Encoders.product[MediaRow]
    implicit val encOut = Encoders.product[ThumbRow]
    df.selectExpr("id", "media", "mime").as[MediaRow].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        Decode.thumbnail(r.media, tw, th).map { case (w, h, t) =>
          ThumbRow(r.id, w, h, t.toIndexedSeq)
        }
      }
    }.toDF()
  }

  /** Batched nearest-neighbor audio RESAMPLE — [[Decode.audioResample]]
    * per partition, payload bytes never leaving it; undecodable rows drop
    * (flatMap). Input: (id: long, media: binary, mime: string).
    */
  def audioResampleDF(df: DataFrame, k: Int): DataFrame = {
    implicit val encIn = Encoders.product[MediaRow]
    implicit val encOut = Encoders.product[ResampleRow]
    df.selectExpr("id", "media", "mime").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        Decode.audioResample(r.media, k).map { case (rate, n, sm) =>
          ResampleRow(r.id, rate, n, sm.toIndexedSeq)
        }
      }
    }.toDF()
  }

  /** Image near-duplicate pairs over the perceptual hash — q45's hamming
    * machinery ([[Hamming.nearDupPairs]]: pigeonhole block join + salted
    * hot-bucket guard) reused on the decoded image corpus. Input: any frame
    * with (id, phash_hi, phash_lo) — e.g. [[decodeMediaDF]] output filtered
    * to kind = 'image'. Output: (id_a, id_b, hamming), exact and complete.
    */
  def imageNearDupPairs(decoded: DataFrame, maxHamming: Int = 5,
                        targetBucket: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.functions._
    val sigs = decoded.select(col("id"),
      (shiftleft(col("phash_hi"), 32).bitwiseOR(col("phash_lo"))).as("phash"))
    Hamming.nearDupPairs(sigs, "id", "phash",
      nBits = 64, maxHamming = maxHamming, targetBucket = targetBucket)
  }

  /** Deterministic REAL-container synthesis (for fixtures and specs): the
    * PNGs carry correct CRC32s and a zlib-deflated IDAT — any standard
    * decoder accepts them — and the WAVs are canonical PCM. Synthesis runs
    * executor-side in fixture generation; nothing here touches the driver.
    */
  object Synth {

    /** 8-bit grayscale PNG, w x h, deterministic pixels from `seed`. */
    def png(w: Int, h: Int, seed: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))

      def chunk(typ: String, data: Array[Byte]): Unit = {
        val len = data.length
        out.write(Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
        val crc = new java.util.zip.CRC32()
        val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        crc.update(t); crc.update(data)
        out.write(t); out.write(data)
        val c = crc.getValue
        out.write(Array((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
      }

      val ihdr = java.nio.ByteBuffer.allocate(13)
      ihdr.putInt(w).putInt(h)
      ihdr.put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      chunk("IHDR", ihdr.array())

      // scanlines: filter byte 0 + deterministic gray values
      val raw = new Array[Byte]((w + 1) * h)
      var y = 0
      while (y < h) {
        raw(y * (w + 1)) = 0
        var x = 0
        while (x < w) {
          raw(y * (w + 1) + 1 + x) = ((seed + 31L * y + x) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val zbuf = new Array[Byte](raw.length + 64)
      val zlen = deflater.deflate(zbuf)
      deflater.end()
      chunk("IDAT", java.util.Arrays.copyOf(zbuf, zlen))
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** 16-bit mono PCM WAV, deterministic samples from `seed`. */
    def wav(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
      val dataLen = nSamples * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits per sample
      bb.put("data".getBytes).putInt(dataLen)
      var i = 0
      while (i < nSamples) {
        bb.putShort(((seed + 97L * i) & 0x7fff).toShort)
        i += 1
      }
      bb.array()
    }

    /** PCM WAV at any of the decoder's supported shapes — bits in {8,16,24}
      * (8 written unsigned per the WAV spec, wider signed little-endian),
      * any channel count; interleaved sample k (frame-major) is
      * `(seed + 97*k) mod 2^(bits-1)` so spec oracles recompute RMS in
      * closed form. `sampleRate = 0` deliberately produces the malformed
      * header the decoder must degrade on.
      */
    def wavEx(sampleRate: Int, nFrames: Int, seed: Long,
              bits: Int = 16, channels: Int = 1): Array[Byte] = {
      require(bits == 8 || bits == 16 || bits == 24, s"bits=$bits")
      val bytesPer = bits / 8
      val block = bytesPer * channels
      val dataLen = nFrames * block
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16)
        .putShort(1) // integer PCM
        .putShort(channels.toShort)
        .putInt(sampleRate)
        .putInt(sampleRate * block)
        .putShort(block.toShort)
        .putShort(bits.toShort)
      bb.put("data".getBytes).putInt(dataLen)
      var k = 0
      val nSamples = nFrames * channels
      while (k < nSamples) {
        val v = (seed + 97L * k) & ((1L << (bits - 1)) - 1)
        bits match {
          case 8  => bb.put((v + 128).toByte) // unsigned, re-centered
          case 16 => bb.putShort(v.toShort)
          case 24 => bb.put(v.toByte).put((v >> 8).toByte).put((v >> 16).toByte)
        }
        k += 1
      }
      bb.array()
    }

    /** Minimal valid ISO BMFF (MP4) header: ftyp + moov{mvhd v0 +
      * trak{tkhd v0 with 16.16 dimensions}}. Header-only (no mdat) — what
      * the metadata probe reads; any box walker accepts the layout.
      */
    def mp4(w: Int, h: Int, timescale: Int, duration: Long): Array[Byte] = {
      def box(typ: String, payload: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
        bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
        bb.array()
      }
      val ftyp = box("ftyp", "isom   isomiso2".getBytes("ISO-8859-1"))
      val mvhd = {
        val bb = java.nio.ByteBuffer.allocate(100)
        bb.putInt(0)            // version 0 + flags
        bb.putInt(0).putInt(0)  // ctime mtime
        bb.putInt(timescale).putInt(duration.toInt)
        bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate volume reserved
        // reserved(8) + matrix(36) + predefined(24) + next_track_id(4) = zeros
        bb.array()
      }
      val tkhd = {
        val bb = java.nio.ByteBuffer.allocate(84)
        bb.putInt(0x00000007)   // version 0 + enabled flags
        bb.putInt(0).putInt(0)  // ctime mtime
        bb.putInt(1).putInt(0)  // track id, reserved
        bb.putInt(duration.toInt)
        bb.putLong(0L)          // reserved
        bb.putShort(0).putShort(0).putShort(0).putShort(0) // layer group volume res
        for (m <- Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)) bb.putInt(m)
        bb.putInt(w << 16).putInt(h << 16) // 16.16 fixed
        bb.array()
      }
      val trak = box("trak", box("tkhd", tkhd))
      val moov = box("moov", box("mvhd", mvhd) ++ trak)
      ftyp ++ moov
    }

    /** Minimal valid RIFF AVI header: LIST/hdrl containing avih with frame
      * period, total frames and dimensions. Header-only, like [[mp4]].
      */
    def avi(w: Int, h: Int, fps: Int, nFrames: Long): Array[Byte] = {
      val avihPayload = {
        val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(if (fps > 0) (1e6 / fps).toInt else 0) // dwMicroSecPerFrame
        bb.putInt(0).putInt(0).putInt(0)
        bb.putInt(nFrames.toInt)  // dwTotalFrames
        bb.putInt(0).putInt(1).putInt(0)
        bb.putInt(w).putInt(h)
        bb.putInt(0).putInt(0).putInt(0).putInt(0)
        bb.array()
      }
      val bb = java.nio.ByteBuffer.allocate(12 + 12 + 8 + avihPayload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes)
      bb.putInt(4 + 12 + 8 + avihPayload.length)
      bb.put("AVI ".getBytes)
      bb.put("LIST".getBytes).putInt(4 + 8 + avihPayload.length).put("hdrl".getBytes)
      bb.put("avih".getBytes).putInt(avihPayload.length).put(avihPayload)
      bb.array()
    }
  }
}
