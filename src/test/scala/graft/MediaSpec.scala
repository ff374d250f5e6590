package graft

import graft.llm.Multimodal
import graft.llm.Multimodal.{MediaRow, Probe, Synth}

import org.scalatest.funsuite.AnyFunSuite

/** Real media-container parsing specs. The synthesized PNG/WAV are validated
  * with the JDK's OWN decoders (ImageIO / AudioSystem) — independent
  * implementations — so the fixtures q41 ingests are genuinely valid
  * containers, not merely bytes our parser happens to accept; then the
  * header parsers are pinned against handcrafted JPEG/GIF/BMP headers and
  * corrupt-input fallbacks.
  */
class MediaSpec extends AnyFunSuite {

  import SparkFixture._

  test("Synth.png is a real PNG: the JDK decoder accepts it and pixels match the formula") {
    val (w, h, seed) = (13, 7, 42L)
    val bytes = Synth.png(w, h, seed)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected the PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val gray = img.getRaster.getSample(x, y, 0)
      assert(gray == ((seed + 31L * y + x) & 0xff).toInt, s"pixel ($x,$y)")
    }
  }

  test("Synth.wav is a real WAV: the JDK audio system reads format and frame count") {
    val bytes = Synth.wav(11025, 777, 9L)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 11025f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    assert(in.getFrameLength == 777L)
  }

  test("Probe round-trips Synth containers (png dims/depth/channels, wav rate/samples)") {
    val p = Probe.probe(Synth.png(640, 360, 1L))
    assert(p.format == "png" && p.width == 640 && p.height == 360 &&
      p.bit_depth == 8 && p.n_channels == 1 && p.sample_rate == -1)
    val a = Probe.probe(Synth.wav(16000, 1234, 2L))
    assert(a.format == "wav" && a.sample_rate == 16000 && a.n_samples == 1234L &&
      a.bit_depth == 16 && a.n_channels == 1 && a.width == -1)
  }

  test("JPEG SOF parsing: walks past APP segments to the frame header") {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    b(0xff, 0xd8) // SOI
    b(0xff, 0xe0, 0x00, 0x10); (0 until 14).foreach(_ => out.write(0)) // APP0 len 16
    b(0xff, 0xdb, 0x00, 0x04, 0x00, 0x00) // DQT len 4
    // SOF0: len 17, precision 8, height 1080, width 1920, 3 components
    b(0xff, 0xc0, 0x00, 0x11, 0x08, 0x04, 0x38, 0x07, 0x80, 0x03)
    (0 until 9).foreach(_ => out.write(0))
    val m = Probe.probe(out.toByteArray)
    assert(m.format == "jpeg" && m.width == 1920 && m.height == 1080 &&
      m.bit_depth == 8 && m.n_channels == 3)
  }

  test("GIF and BMP header parsing") {
    val gif = "GIF89a".getBytes ++ Array[Byte](
      0x40, 0x01, // width 320 LE
      0xc8.toByte, 0x00, // height 200 LE
      0x70, 0x00, 0x00) // flags: color resolution (7>>4 &7)+1 = 8
    val g = Probe.probe(gif ++ new Array[Byte](8))
    assert(g.format == "gif" && g.width == 320 && g.height == 200 && g.bit_depth == 8)

    val bmp = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    bmp.putInt(40).putInt(800).putInt(-600) // negative height = top-down
    bmp.putShort(1).putShort(24)
    val m = Probe.probe(bmp.array())
    assert(m.format == "bmp" && m.width == 800 && m.height == 600 &&
      m.bit_depth == 24 && m.n_channels == 3)
  }

  test("zero-sample WAV (exactly 44 bytes) is a valid container, not raw") {
    val bytes = Synth.wav(8000, 0, 0L)
    assert(bytes.length == 44)
    val m = Probe.probe(bytes)
    assert(m.format == "wav" && m.sample_rate == 8000 && m.n_samples == 0L)
  }

  test("corrupt RIFF chunk length that would advance the cursor by zero terminates (no hang)") {
    // len = 0xFFFFFFF8: 8 + (-8) + 0 with Int math advances 0 forever; the
    // Long cursor must walk past the end and degrade via the probe catch
    val b = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
    b.put("junk".getBytes).putInt(0xFFFFFFF8)
    val m = Probe.probe(b.array()) // must return, not loop
    assert(m.format == "raw") // no fmt chunk found -> require fails -> raw
  }

  test("corrupt and truncated containers degrade to raw, never throw") {
    val truncPng = Synth.png(4, 4, 0L).take(20) // signature ok, IHDR cut off
    assert(Probe.probe(truncPng).format == "raw")
    assert(Probe.probe(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00)).format == "raw")
    assert(Probe.probe("RIFFxxxxWAVE".getBytes ++ new Array[Byte](40)).format == "raw")
    assert(Probe.probe(Array.emptyByteArray).format == "raw")
    assert(Probe.probe("just some text".getBytes).format == "raw")
  }

  test("fuzz: probe never throws on random or bit-flipped containers (500 samples)") {
    val rnd = new scala.util.Random(1234)
    for (i <- 1 to 250) {
      val junk = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(junk)
      Probe.probe(junk) // must not throw; format is whatever it is
    }
    for (i <- 1 to 125) {
      // valid container with one flipped byte: parse or degrade, never throw
      val png = Synth.png(1 + rnd.nextInt(20), 1 + rnd.nextInt(20), i.toLong)
      png(rnd.nextInt(png.length)) = rnd.nextInt(256).toByte
      Probe.probe(png)
      val wav = Synth.wav(8000 + rnd.nextInt(40000), rnd.nextInt(500), i.toLong)
      wav(rnd.nextInt(wav.length)) = rnd.nextInt(256).toByte
      Probe.probe(wav)
    }
    for (i <- 1 to 125) {
      // truncation at every kind of boundary
      val full = Synth.png(8, 8, i.toLong)
      Probe.probe(full.take(rnd.nextInt(full.length)))
    }
    for (i <- 1 to 125) {
      // video containers: bit-flips and truncations over the box/chunk walks
      val mp4 = Synth.mp4(1 + rnd.nextInt(4096), 1 + rnd.nextInt(2160),
        1 + rnd.nextInt(90000), rnd.nextInt(1000000).toLong)
      mp4(rnd.nextInt(mp4.length)) = rnd.nextInt(256).toByte
      Probe.probe(mp4)
      Probe.probe(mp4.take(rnd.nextInt(mp4.length)))
      val avi = Synth.avi(1 + rnd.nextInt(4096), 1 + rnd.nextInt(2160),
        1 + rnd.nextInt(120), rnd.nextInt(1000000).toLong)
      avi(rnd.nextInt(avi.length)) = rnd.nextInt(256).toByte
      Probe.probe(avi)
      Probe.probe(avi.take(rnd.nextInt(avi.length)))
    }
  }

  test("Synth/Probe round-trip holds across random dimensions (100 samples)") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 50) {
      val (w, h) = (1 + rnd.nextInt(500), 1 + rnd.nextInt(300))
      val m = Probe.probe(Synth.png(w, h, rnd.nextLong()))
      assert(m.format == "png" && m.width == w && m.height == h)
    }
    for (_ <- 1 to 50) {
      val (r, n) = (4000 + rnd.nextInt(92000), rnd.nextInt(2000))
      val m = Probe.probe(Synth.wav(r, n, rnd.nextLong()))
      assert(m.format == "wav" && m.sample_rate == r && m.n_samples == n.toLong)
    }
  }

  test("probeMeta: per-partition batch contract preserves ids and dispatches by magic") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      MediaRow(1L, Synth.png(3, 2, 1L), "application/octet-stream"),
      MediaRow(2L, Synth.wav(8000, 100, 2L), "application/octet-stream"),
      MediaRow(3L, "not media".getBytes, "application/octet-stream"))
    val out = Multimodal.probeMeta(rows.toDS().repartition(2))
      .collect().map(m => m.id -> m.format).toMap
    assert(out == Map(1L -> "png", 2L -> "wav", 3L -> "raw"))
  }

  // ------------------------------------------------------------------
  // Real decode (ImageIO / AudioSystem)
  // ------------------------------------------------------------------

  /** Reference aHash over the Synth pixel formula (independent of Decode's
    * code path): nearest-neighbor 8x8 sample, strict > mean.
    */
  private def formulaHash(w: Int, h: Int, seed: Long): (Long, Double) = {
    def pixel(x: Int, y: Int): Int = ((seed + 31L * y + x) & 0xff).toInt
    val s = (0 until 64).map(k => pixel(((k % 8) * w) / 8, ((k / 8) * h) / 8))
    val mean = s.sum / 64.0
    val hash = s.zipWithIndex.foldLeft(0L) { case (acc, (v, k)) =>
      if (v > mean) acc | (1L << k) else acc
    }
    val lum = (for { y <- 0 until h; x <- 0 until w } yield pixel(x, y).toLong).sum
    (hash, lum.toDouble / (w * h))
  }

  test("Decode.image round-trips Synth parameters: dims, mean luminance, aHash") {
    for ((w, h, seed) <- Seq((16, 9, 7L), (1, 1, 0L), (5, 12, 255L), (33, 2, 1234L))) {
      val d = Multimodal.Decode.image(Synth.png(w, h, seed))
      val (expHash, expLum) = formulaHash(w, h, seed)
      assert(d.kind == "image" && d.width == w && d.height == h)
      assert(d.mean_lum == expLum, s"mean_lum for ($w,$h,$seed)")
      assert(((d.phash_hi << 32) | d.phash_lo) == expHash, s"phash for ($w,$h,$seed)")
      assert(d.phash_hi >= 0 && d.phash_lo >= 0) // SQL-safe halves
      assert(d.n_samples == -1L && d.rms == -1d)
    }
  }

  test("Decode.audio round-trips Synth parameters: samples, rate, RMS, duration") {
    for ((rate, n, seed) <- Seq((8000, 500, 3L), (44100, 1, 9L), (8200, 599, 77L))) {
      val d = Multimodal.Decode.audio(Synth.wav(rate, n, seed))
      assert(d.kind == "audio" && d.sample_rate == rate && d.n_samples == n.toLong)
      val sumSq = (0 until n).map { i =>
        val s = ((seed + 97L * i) & 0x7fff).toDouble; s * s
      }.sum
      assert(d.rms == math.sqrt(sumSq / n), s"rms for ($rate,$n,$seed)")
      assert(d.duration_s == n.toDouble / rate)
      assert(d.width == -1 && d.phash_hi == -1L)
    }
  }

  test("Decode.audio breadth: 8-bit unsigned, 24-bit, stereo — RMS/frames/duration oracles") {
    // interleaved sample k = (seed + 97k) mod 2^(bits-1); rms is over ALL
    // samples of ALL channels, n_samples counts frames
    def expRms(nSamples: Int, seed: Long, bits: Int): Double = {
      val mask = (1L << (bits - 1)) - 1
      val sq = (0 until nSamples).map { k =>
        val s = ((seed + 97L * k) & mask).toDouble; s * s
      }.sum
      math.sqrt(sq / nSamples)
    }
    // 8-bit unsigned mono: offset-128 removal recovers the raw value
    val d8 = Multimodal.Decode.audio(Synth.wavEx(8000, 400, 5L, bits = 8))
    assert(d8.kind == "audio" && d8.n_samples == 400L && d8.sample_rate == 8000)
    assert(d8.rms == expRms(400, 5L, 8))
    // 24-bit mono
    val d24 = Multimodal.Decode.audio(Synth.wavEx(16000, 300, 9L, bits = 24))
    assert(d24.kind == "audio" && d24.n_samples == 300L)
    assert(d24.rms == expRms(300, 9L, 24))
    // 16-bit STEREO: 250 frames = 500 interleaved samples; duration from frames
    val ds = Multimodal.Decode.audio(Synth.wavEx(8000, 250, 3L, bits = 16, channels = 2))
    assert(ds.kind == "audio" && ds.n_samples == 250L)
    assert(ds.rms == expRms(500, 3L, 16))
    assert(ds.duration_s == 250.0 / 8000)
    // wavEx(bits=16, channels=1) must byte-match the original Synth.wav shape
    assert(java.util.Arrays.equals(Synth.wavEx(8000, 100, 7L), Synth.wav(8000, 100, 7L)))
  }

  test("Decode.audio degrades on malformed rate and float PCM, never Infinity/NaN") {
    // rate 0 header: duration would be Infinity without the guard
    val d = Multimodal.Decode.decode(Synth.wavEx(0, 100, 1L))
    assert(d.kind == "unknown" && d.duration_s == -1d)
  }

  test("bulk raster read: 10-megapixel decode stays fast and formula-exact") {
    val (w, h) = (3650, 2740) // ~10 MP
    val bytes = Synth.png(w, h, 42L)
    val t0 = System.nanoTime()
    val d = Multimodal.Decode.image(bytes)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(d.width == w && d.height == h)
    val (expHash, expLum) = formulaHash(w, h, 42L)
    assert(d.mean_lum == expLum && ((d.phash_hi << 32) | d.phash_lo) == expHash)
    // generous bound: the bulk path decodes 10 MP well under a second on
    // any modern box; the old per-pixel getRGB path took multiples of this
    assert(sec < 5.0, f"10 MP decode took $sec%.1f s")
  }

  test("MP4/AVI container probe: Synth round-trips dims, timescale, frames") {
    val m = Probe.probe(Synth.mp4(1920, 1080, 90000, 450000L))
    assert(m.format == "mp4" && m.width == 1920 && m.height == 1080)
    assert(m.sample_rate == 90000 && m.n_samples == 450000L) // 5 s in timescale units
    val a = Probe.probe(Synth.avi(640, 480, 30, 900L))
    assert(a.format == "avi" && a.width == 640 && a.height == 480)
    assert(a.sample_rate == 30 && a.n_samples == 900L)
    // truncated/corrupt video containers degrade to raw, never throw
    assert(Probe.probe(Synth.mp4(64, 48, 1000, 10L).take(16)).format == "raw")
    assert(Probe.probe(Synth.avi(64, 48, 25, 10L).take(14)).format == "raw")
  }

  test("sampleVideoFrames: header-driven enumeration, stubbed decode, bounded per task") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      MediaRow(1L, Synth.avi(8, 4, 30, 90L), "m"),   // 90 frames -> 3 at every 30th
      MediaRow(2L, Synth.mp4(16, 8, 1000, 2000L), "m"), // 2 s * 30 fps = 60 -> 2
      MediaRow(3L, Synth.png(4, 4, 1L), "m"))        // not video -> 0 frames
    val frames = Multimodal.sampleVideoFrames(rows.toDS(), everyNth = 30).collect()
    assert(frames.map(f => (f.id, f.frame_idx)).sorted.toSeq ==
      Seq((1L, 0L), (1L, 30L), (1L, 60L), (2L, 0L), (2L, 30L)))
    // frame payload is the DOCUMENTED deterministic stub with real shape
    val f0 = frames.find(f => f.id == 1L && f.frame_idx == 30L).get
    assert(f0.width == 8 && f0.height == 4 && f0.frame.length == 32)
    assert((f0.frame(5) & 0xff) == ((1L + 31L * 30L + 5L) & 0xff).toInt)
    // maxFrames bounds a pathological container
    val long = Seq(MediaRow(9L, Synth.avi(4, 4, 30, 1000000L), "m")).toDS()
    assert(Multimodal.sampleVideoFrames(long, everyNth = 1, maxFrames = 64).count() == 64L)
    // a LYING header (50000x50000 would overflow w*h to a negative array
    // size) degrades to clamped stub frames — never a task failure
    val liar = Seq(MediaRow(10L, Synth.avi(50000, 50000, 30, 3L), "m")).toDS()
    val lf = Multimodal.sampleVideoFrames(liar, everyNth = 1).collect()
    assert(lf.length == 3 && lf.forall(f => f.width == 4096 && f.height == 4096))
  }

  test("Decode dispatch: wav by RIFF magic, png by ImageIO, junk degrades to unknown") {
    assert(Multimodal.Decode.decode(Synth.wav(8000, 10, 1L)).kind == "audio")
    assert(Multimodal.Decode.decode(Synth.png(4, 4, 1L)).kind == "image")
    assert(Multimodal.Decode.decode("junk bytes, not a container".getBytes).kind == "unknown")
    assert(Multimodal.Decode.decode(Array.emptyByteArray).kind == "unknown")
    // truncated PNG: magic intact, data missing
    assert(Multimodal.Decode.decode(Synth.png(8, 8, 1L).take(20)).kind == "unknown")
  }

  test("imageNearDupPairs: q45's hamming machinery finds planted image duplicates") {
    val s = spark
    import s.implicits._
    // corpus: 20 distinct images + 3 exact re-encodes of image 0 (same
    // pixels => identical aHash => hamming 0) — the re-crawl/dup shape
    val rows =
      (0L until 20L).map(i => MediaRow(i, Synth.png(8 + (i % 5).toInt, 8, i * 13), "m")) ++
        Seq(100L, 101L, 102L).map(i => MediaRow(i, Synth.png(8, 8, 0L), "m"))
    val decoded = Multimodal.decodeMediaDF(s, rows.toDF("id", "media", "mime"))
      .filter($"kind" === "image")
    val pairs = Multimodal.imageNearDupPairs(decoded, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force expectation over the decoded hashes
    val hashes = decoded.select("id", "phash_hi", "phash_lo").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1) << 32) | r.getLong(2))).toMap
    val brute = (for {
      (a, ha) <- hashes.toSeq; (b, hb) <- hashes.toSeq if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 5
    } yield (a, b, d)).toSet
    assert(pairs == brute)
    // the planted duplicate cluster is in there at distance 0 — note
    // 0 vs 100/101/102: Synth.png(8,8,0) == Synth.png(8,8,0*13)
    for (p <- Seq((0L, 100L), (0L, 101L), (100L, 101L), (100L, 102L)))
      assert(pairs.contains((p._1, p._2, 0)), s"missing planted dup $p")
  }
}
