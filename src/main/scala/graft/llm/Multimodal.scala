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
  }
}
