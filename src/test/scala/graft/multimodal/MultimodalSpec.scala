package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.multimodal.Multimodal._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val media = Seq(
    MediaRecord(1L, "image", MediaCodecs.pngBytes(640, 480), """{"fmt": "png", "src": "cam1"}"""),
    MediaRecord(2L, "video", MediaCodecs.mjpegBytes(320, 240, 6), """{"fmt": "mjpeg", "src": "cam2"}"""),
    MediaRecord(3L, "audio", MediaCodecs.wavBytes(2, 44100, 16, 441), """{"fmt": "wav", "src": "mic1"}""")
  ).toDS()

  // ------------------------------------------------------------- codecs

  test("JPEG round-trip: SOF0 dims survive the builder → marker-walk parser") {
    for ((w, h) <- Seq((1, 1), (64, 64), (255, 256), (1920, 1080), (65535, 65535))) {
      val b = MediaCodecs.jpegBytes(w, h)
      assert(MediaCodecs.isJpeg(b))
      assert(MediaCodecs.parseJpeg(b).contains(MediaCodecs.ImageInfo(w, h)),
        s"JPEG ${w}x$h did not round-trip")
    }
  }

  test("PNG round-trip: IHDR dims + CRC survive; corrupted CRC is rejected") {
    for ((w, h) <- Seq((1, 1), (640, 480), (70000, 3))) { // PNG dims are u32 — past JPEG's u16
      val b = MediaCodecs.pngBytes(w, h)
      assert(MediaCodecs.isPng(b))
      assert(MediaCodecs.parsePng(b).contains(MediaCodecs.ImageInfo(w, h)))
    }
    val corrupt = MediaCodecs.pngBytes(640, 480)
    corrupt(17) = (corrupt(17) ^ 0x40).toByte // flip a width bit; CRC now stale
    assert(MediaCodecs.parsePng(corrupt).isEmpty, "CRC-invalid IHDR must not parse")
  }

  test("WAV round-trip: fmt/data chunk walk recovers channels, rate, bits, frames") {
    val b = MediaCodecs.wavBytes(channels = 2, sampleRate = 44100, bitsPerSample = 16, nSampleFrames = 441)
    assert(MediaCodecs.isWav(b))
    assert(MediaCodecs.parseWav(b).contains(MediaCodecs.WavInfo(2, 44100, 16, 441L)))
    assert(b.length == 44 + 441 * 4) // canonical header + PCM frames
  }

  test("MJPEG frame walk finds every SOI..EOI span; single JPEG is one frame") {
    val stream = MediaCodecs.mjpegBytes(320, 240, 6)
    val offs = MediaCodecs.mjpegFrameOffsets(stream)
    assert(offs.length == 6)
    assert(offs.forall { case (s, e) => e - s == 23 }) // header-only frame size
    assert(MediaCodecs.mjpegFrameOffsets(MediaCodecs.jpegBytes(8, 8)).length == 1)
  }

  test("JPEG parser handles a realistic file: APP0/DQT/DHT/SOS entropy, FF-stuffing, RST") {
    val out = new java.io.ByteArrayOutputStream()
    def w(bs: Int*): Unit = bs.foreach(b => out.write(b & 0xff))
    w(0xff, 0xd8)                                                    // SOI
    w(0xff, 0xe0, 0x00, 0x10); (1 to 14).foreach(_ => w(0x4a))       // APP0/JFIF, len 16
    w(0xff, 0xdb, 0x00, 0x43, 0x00); (1 to 64).foreach(i => w(i))    // DQT, len 67
    w(0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0xe0, 0x02, 0x80, 0x03,   // SOF0: 640x480
      0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    w(0xff, 0xc4, 0x00, 0x1f, 0x00); (1 to 28).foreach(_ => w(0x05)) // DHT, len 31
    w(0xff, 0xda, 0x00, 0x0c, 0x03, 0x01, 0x00, 0x02, 0x11, 0x03,   // SOS, len 12
      0x11, 0x00, 0x3f, 0x00)
    w(0x12, 0x34, 0xff, 0x00, 0x56, 0xff, 0xd0, 0x78, 0x9a)         // entropy: stuffed FF00 + RST0
    w(0xff, 0xd9)                                                    // EOI
    val jpeg = out.toByteArray
    assert(MediaCodecs.parseJpeg(jpeg).contains(MediaCodecs.ImageInfo(640, 480)))
    assert(MediaCodecs.mjpegFrameOffsets(jpeg) == IndexedSeq((0, jpeg.length)))
    // trailing non-SOI junk ends the MJPEG walk without corrupting the frame
    val junked = jpeg ++ Array[Byte](0x00, 0x42)
    assert(MediaCodecs.mjpegFrameOffsets(junked) == IndexedSeq((0, jpeg.length)))
  }

  test("WAV parser walks past extra chunks before fmt/data") {
    val base = MediaCodecs.wavBytes(1, 8000, 16, 10)
    // splice a LIST chunk between the RIFF header and fmt (real encoders do this)
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.slice(0, 12) ++ extra ++ base.drop(12)
    assert(MediaCodecs.parseWav(spliced).contains(MediaCodecs.WavInfo(1, 8000, 16, 10L)))
  }

  test("WAV parser survives a corrupt near-2^32 chunk size (no crash, no hang)") {
    // RIFF/WAVE + one chunk claiming size 0xFFFFFFFF: the u32->int
    // overflow used to drive the walk position negative and throw
    val evil = "RIFF".getBytes("US-ASCII") ++ Array[Byte](36, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "JUNK".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, -1)
    assert(MediaCodecs.parseWav(evil).isEmpty)
    // and through decode(): a flagged row, not a task failure
    val d = decode(Seq(MediaRecord(7L, "audio", evil, "{}")).toDS()).collect().head
    assert(d == Decoded(7L, "audio", -1, -1, 0, evil.length.toLong))
  }

  test("WAV data chunk over-declaring its size is clamped to the bytes present") {
    // 10 mono 16-bit frames (20 data bytes); patch the declared data size
    // to 0xFFFFFFFF — the parse must clamp to the real 20 bytes instead of
    // wrapping the frame count (and decode() must not go negative)
    val evil = MediaCodecs.wavBytes(1, 8000, 16, 10)
    evil(40) = -1; evil(41) = -1; evil(42) = -1; evil(43) = -1
    assert(MediaCodecs.parseWav(evil).contains(MediaCodecs.WavInfo(1, 8000, 16, 10L)))
    val d = decode(Seq(MediaRecord(8L, "audio", evil, "{}")).toDS()).collect().head
    assert(d == Decoded(8L, "audio", 0, 0, 10, evil.length.toLong))
  }

  test("JPEG FF fill bytes before a marker are skipped (T.81 B.1.1.2)") {
    val base = MediaCodecs.jpegBytes(320, 240)
    // splice fill runs before the SOF marker and before EOI — legal encoders
    // may pad with any number of 0xFF bytes ahead of a marker
    val filled = base.slice(0, 2) ++ Array.fill(3)(0xff.toByte) ++
      base.slice(2, base.length - 2) ++ Array.fill(2)(0xff.toByte) ++
      base.drop(base.length - 2)
    assert(MediaCodecs.parseJpeg(filled).contains(MediaCodecs.ImageInfo(320, 240)))
    assert(MediaCodecs.mjpegFrameOffsets(filled) == IndexedSeq((0, filled.length)))
  }

  test("fitWithin never upscales: dims already inside the bounds are unchanged") {
    assert(fitWithin(16, 16, 32, 32) == ((16, 16)))
    assert(fitWithin(100, 50, 32, 32) == ((32, 16)))
    assert(fitWithin(50, 100, 32, 32) == ((16, 32)))
  }

  test("PPM round-trip: P6 header with comments parses; raster offset is exact") {
    val b = MediaCodecs.ppmBytes(3, 2, (x, y) => (x * 10, y * 20, x + y))
    val parsed = MediaCodecs.parsePpm(b)
    assert(parsed.map(_._1).contains(MediaCodecs.ImageInfo(3, 2)))
    val off = parsed.get._2
    assert(b.length - off == 3 * 3 * 2)
    assert((b(off) & 0xff, b(off + 1) & 0xff, b(off + 2) & 0xff) == ((0, 0, 0)))
    // a commented header (real Netpbm tools emit these) still parses
    val commented = "P6\n# made by hand\n3 2\n255\n".getBytes("US-ASCII") ++ b.drop(off)
    assert(MediaCodecs.parsePpm(commented).map(_._1).contains(MediaCodecs.ImageInfo(3, 2)))
  }

  test("resizePpmNearest: floor-mapped source pixels land in the output raster") {
    // 4x2 with pixel = (x, y, x+y); downscale to 2x1: picks (0,0) and (2,0)
    val src = MediaCodecs.ppmBytes(4, 2, (x, y) => (x, y, x + y))
    val out = MediaCodecs.resizePpmNearest(src, 2, 1).get
    val Some((info, off)) = MediaCodecs.parsePpm(out)
    assert(info == MediaCodecs.ImageInfo(2, 1))
    assert((out(off) & 0xff) == 0 && (out(off + 3) & 0xff) == 2) // r channel = srcX
  }

  test("resizeImages fits within bounds preserving aspect; non-PPM passes through") {
    val rows = Seq(
      MediaRecord(1L, "image", MediaCodecs.ppmBytes(100, 50, (_, _) => (1, 2, 3)), "{}"),
      MediaRecord(2L, "image", MediaCodecs.ppmBytes(10, 20, (_, _) => (4, 5, 6)), "{}"), // fits
      MediaRecord(3L, "image", MediaCodecs.pngBytes(640, 480), "{}")                     // not PPM
    ).toDS()
    val out = resizeImages(rows, maxW = 32, maxH = 32).collect().sortBy(_.media_id)
    val Some((d1, _)) = MediaCodecs.parsePpm(out(0).content)
    assert(d1 == MediaCodecs.ImageInfo(32, 16)) // 100x50 → 32x16, aspect held
    val Some((d2, _)) = MediaCodecs.parsePpm(out(1).content)
    assert(d2 == MediaCodecs.ImageInfo(10, 20)) // already inside: untouched
    assert(out(2).content.sameElements(MediaCodecs.pngBytes(640, 480)))
  }

  // ------------------------------------------------------------- decode

  test("decode parses real headers: PNG/MJPEG dims, WAV sample frames") {
    val d = decode(media).collect().sortBy(_.media_id)
    assert(d(0) == Decoded(1L, "image", 640, 480, 1, 45L))
    assert(d(1) == Decoded(2L, "video", 320, 240, 6, 23L * 6))
    assert(d(2) == Decoded(3L, "audio", 0, 0, 441, 44L + 441 * 4))
  }

  test("decode flags unrecognized bytes as (-1,-1,0) instead of throwing") {
    val junk = Seq(MediaRecord(9L, "image", Array.fill(64)(0x42.toByte), "{}")).toDS()
    assert(decode(junk).collect().head == Decoded(9L, "image", -1, -1, 0, 64L))
  }

  test("extractFeatures: PPM grid vector = exact subsampled pixel bytes") {
    // 8x8 image, pixel = (x, y, x+y); grid 4 samples sx = x*8/4 = 2x
    val rows = Seq(MediaRecord(1L, "image",
      MediaCodecs.ppmBytes(8, 8, (x, y) => (x, y, x + y)), "{}")).toDS()
    val f = extractFeatures(rows, grid = 4).collect().head
    assert(f.embedding.length == 48)
    for (cy <- 0 until 4; cx <- 0 until 4) {
      val d = 3 * (cy * 4 + cx)
      assert(f.embedding(d) == (2 * cx).toFloat)      // r = sampled x
      assert(f.embedding(d + 1) == (2 * cy).toFloat)  // g = sampled y
      assert(f.embedding(d + 2) == (2 * cx + 2 * cy).toFloat)
    }
  }

  test("extractFeatures: WAV PCM frame stats match hand arithmetic") {
    // samples: [100, -200, 300, -400, 500, -600, 700, 800] → n=8
    val s = Array[Short](100, -200, 300, -400, 500, -600, 700, 800)
    val rows = Seq(MediaRecord(2L, "audio",
      MediaCodecs.wavPcmBytes(8000, s), "{}")).toDS()
    val f = extractFeatures(rows).collect().head
    // sum|s| = 3600, mean = 450; sign changes at 6 of 7 steps; max 800
    // quarters of 2: means (150, 350, 550, 750)
    assert(f.embedding.toSeq == Seq(8f, 450f, 6f, 800f, 150f, 350f, 550f, 750f))
  }

  test("extractFeatures flags non-decodable content with an empty vector") {
    val rows = Seq(
      MediaRecord(3L, "image", MediaCodecs.pngBytes(64, 64), "{}"),    // no raster
      MediaRecord(4L, "image", Array.fill(32)(0x42.toByte), "{}"),     // junk
      MediaRecord(5L, "audio", MediaCodecs.wavBytes(1, 8000, 8, 4), "{}") // 8-bit PCM
    ).toDS()
    val out = extractFeatures(rows).collect()
    assert(out.forall(_.embedding.isEmpty))
  }

  test("sampleFrames: MJPEG emits evenly spaced REAL JPEG frames; others pass whole") {
    val frames = sampleFrames(media, maxFrames = 4).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(1L).length == 1 && byId(3L).length == 1)
    assert(byId(2L).length == 4) // 6 frames sampled down to 4
    assert(byId(2L).map(_.frame_idx).toSet == Set(0, 1, 3, 5)) // k*(nf-1)/(n-1)
    // every extracted video frame is itself a parseable standalone JPEG
    byId(2L).foreach { f =>
      assert(MediaCodecs.parseJpeg(f.frame_bytes).contains(MediaCodecs.ImageInfo(320, 240)))
    }
    assert(byId(1L).head.frame_bytes.length == 45) // whole PNG passes through
  }

  test("withMeta extracts typed JSON metadata fields") {
    val out = withMeta(media.toDF(), Map("fmt" -> "$.fmt", "src" -> "$.src"))
      .select("media_id", "fmt", "src").as[(Long, String, String)].collect().toSet
    assert(out == Set((1L, "png", "cam1"), (2L, "mjpeg", "cam2"), (3L, "wav", "mic1")))
  }

  // --------------------------------------------------- byte partitioning

  private def partitionBytes(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val idx = df.schema.fieldIndex("content")
    df.rdd.mapPartitions { it =>
      var s = 0L
      it.foreach(r => s += r.get(idx).asInstanceOf[Array[Byte]].length.toLong)
      Iterator(s)
    }.collect().toSeq
  }

  test("repartitionByBytes balances actual bytes, not row counts") {
    // 64 rows of 1 KiB — uniform sizes, so every 4 KiB bin gets ~4 rows
    val rows = (1L to 64L).map(i => MediaRecord(i, "image", new Array[Byte](1024), "{}"))
    val out = repartitionByBytes(rows.toDS().toDF(), targetBytes = 4096L)
    assert(out.count() == 64)
    assert(out.rdd.getNumPartitions == 16)
    val sizes = partitionBytes(out).filter(_ > 0)
    assert(sizes.max <= 2 * 4096L, s"partition over 2x budget: $sizes")
  }

  test("repartitionByBytes skew: a 100x blob lands ALONE in its partition") {
    val target = 10 * 1024L
    val rows = (1L to 50L).map(i => MediaRecord(i, "image", new Array[Byte](1024), "{}")) :+
      MediaRecord(99L, "video", new Array[Byte](100 * 1024), "{}") // 10x the target
    val out = repartitionByBytes(rows.toDS().toDF(), target)
    assert(out.count() == 51)
    val idIdx = out.schema.fieldIndex("media_id")
    val cIdx = out.schema.fieldIndex("content")
    val perPart = out.rdd.mapPartitions { it =>
      val rs = it.toVector
      Iterator((rs.map(_.get(idIdx).asInstanceOf[Long]),
        rs.map(_.get(cIdx).asInstanceOf[Array[Byte]].length.toLong).sum))
    }.collect()
    val blobPart = perPart.find(_._1.contains(99L)).get
    assert(blobPart._1 == Vector(99L), s"blob shares a partition: ${blobPart._1}")
    // every other partition stays within budget + one row of slack
    perPart.filterNot(_._1.contains(99L)).foreach { case (ids, bytes) =>
      assert(bytes <= target + 1024L, s"partition $ids over budget: $bytes")
    }
    // max/mean over the small partitions stays tight — the balance claim
    val small = perPart.filterNot(_._1.contains(99L)).map(_._2).filter(_ > 0)
    assert(small.max.toDouble / (small.sum.toDouble / small.size) <= 2.0)
  }

  // -------------------------------------------------------------- dHash

  /** Independent dHash reference: plain nested loops over the decoded
    * raster, no shared code with the Dataset path beyond the P6 parser. */
  private def dHashRef(bytes: Array[Byte]): Long = {
    val (info, off) = MediaCodecs.parsePpm(bytes).get
    def gray(gx: Int, gy: Int): Int = {
      val p = off + 3 * ((gy * info.height / 8) * info.width + (gx * info.width / 9))
      (bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)
    }
    (0 until 8).flatMap(gy => (0 until 8).map(gx => (gx, gy)))
      .zipWithIndex
      .foldLeft(0L) { case (acc, ((gx, gy), bit)) =>
        if (gray(gx + 1, gy) > gray(gx, gy)) acc | (1L << bit) else acc
      }
  }

  test("dHash matches an independent reference on random rasters") {
    val rnd = new scala.util.Random(414243)
    val recs = (0 until 30).map { i =>
      val w = 8 + rnd.nextInt(40)
      val h = 8 + rnd.nextInt(40)
      val px = Array.fill(h, w)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      MediaRecord(i.toLong, "image",
        MediaCodecs.ppmBytes(w, h, (x, y) => px(y)(x)), "{}")
    }
    val got = dHash(recs.toDS()).collect().map(d => d.media_id -> d.dhash).toMap
    recs.foreach { r =>
      assert(got(r.media_id) == dHashRef(r.content), s"id ${r.media_id}")
    }
  }

  test("dHash is invariant under a uniform brightness shift; non-PPM rows drop") {
    val rnd = new scala.util.Random(515253)
    val px = Array.fill(20, 30)((rnd.nextInt(200), rnd.nextInt(200), rnd.nextInt(200)))
    val base = MediaRecord(1L, "image",
      MediaCodecs.ppmBytes(30, 20, (x, y) => px(y)(x)), "{}")
    val brighter = MediaRecord(2L, "image",
      MediaCodecs.ppmBytes(30, 20, (x, y) =>
        (px(y)(x)._1 + 19, px(y)(x)._2 + 19, px(y)(x)._3 + 19)), "{}")
    val notPpm = MediaRecord(3L, "image", MediaCodecs.pngBytes(30, 20), "{}")
    val out = dHash(Seq(base, brighter, notPpm).toDS()).collect()
    assert(out.map(_.media_id).sorted.toSeq == Seq(1L, 2L), "non-PPM must drop")
    assert(out(0).dhash == out(1).dhash, "uniform shift must not change dHash")
  }

  test("dHash grid bound: more than 64 bits is rejected") {
    intercept[IllegalArgumentException] {
      dHash(Seq.empty[MediaRecord].toDS(), gridW = 10, gridH = 8)
    }
  }

  test("sigNearDups over dHash equals brute force on planted near-dups") {
    val rnd = new scala.util.Random(616263)
    // 40 random rasters + 10 brightness-shifted copies of the first 10
    val recs = (0 until 40).map { i =>
      val px = Array.fill(16, 16)((rnd.nextInt(220), rnd.nextInt(220), rnd.nextInt(220)))
      (i.toLong, px)
    }
    val rows = recs.map { case (i, px) =>
      MediaRecord(i, "image", MediaCodecs.ppmBytes(16, 16, (x, y) => px(y)(x)), "{}")
    } ++ recs.take(10).map { case (i, px) =>
      MediaRecord(i + 100, "image",
        MediaCodecs.ppmBytes(16, 16, (x, y) =>
          (px(y)(x)._1 + 7, px(y)(x)._2 + 7, px(y)(x)._3 + 7)), "{}")
    }
    val sigs = dHash(rows.toDS()).toDF().select($"media_id", $"dhash")
    val got = graft.dedup.Dedup
      .sigNearDups(sigs, maxHamming = 3, idCol = "media_id", sigCol = "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hs = dHash(rows.toDS()).collect().map(d => d.media_id -> d.dhash).toMap
    val want = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b, d)).toSet
    assert(got == want)
    // every planted (i, i+100) pair is found at hamming 0
    (0L until 10L).foreach { i =>
      assert(got.contains((i, i + 100, 0)), s"planted pair $i missing")
    }
  }

  // -------------------------------------------------- audio fingerprint

  /** Independent energy-delta reference: plain loops over channel-0
    * samples, no shared code with the Dataset path beyond the parser. */
  private def audioFpRef(bytes: Array[Byte], frames: Int = 65): Long = {
    val s = MediaCodecs.wavChannel0Samples(bytes).get
    val n = s.length
    val e = (0 until frames).map(f =>
      (f * n / frames until (f + 1) * n / frames).map(i => math.abs(s(i)).toLong).sum)
    (0 until frames - 1).foldLeft(0L)((acc, f) =>
      if (e(f + 1) > e(f)) acc | (1L << f) else acc)
  }

  test("audioFingerprint matches an independent reference on random clips") {
    val rnd = new scala.util.Random(717273)
    val recs = (0 until 30).map { i =>
      val n = 65 + rnd.nextInt(400)
      val smp = Array.fill(n)((rnd.nextInt(8001) - 4000).toShort)
      MediaRecord(i.toLong, "audio", MediaCodecs.wavPcmBytes(8000, smp), "{}")
    }
    val got = audioFingerprint(recs.toDS()).collect()
      .map(a => a.media_id -> (a.n_samples, a.fp)).toMap
    recs.foreach { r =>
      val n = MediaCodecs.wavChannel0Samples(r.content).get.length
      assert(got(r.media_id) == ((n, audioFpRef(r.content))), s"id ${r.media_id}")
    }
  }

  test("audioFingerprint is volume-invariant; short and non-WAV rows drop") {
    val rnd = new scala.util.Random(818283)
    val smp = Array.fill(300)((rnd.nextInt(2001) - 1000).toShort)
    val loud = smp.map(s => (s * 3).toShort) // |s| ≤ 1000 → ×3 never clips
    val out = audioFingerprint(Seq(
      MediaRecord(1L, "audio", MediaCodecs.wavPcmBytes(8000, smp), "{}"),
      MediaRecord(2L, "audio", MediaCodecs.wavPcmBytes(8000, loud), "{}"),
      MediaRecord(3L, "audio",
        MediaCodecs.wavPcmBytes(8000, Array.fill(64)(5.toShort)), "{}"),
      MediaRecord(4L, "image", MediaCodecs.pngBytes(8, 8), "{}")
    ).toDS()).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L),
      "sub-frame clips and non-WAV rows must drop")
    assert(out(0).fp == out(1).fp, "uniform gain must not change the fingerprint")
    intercept[IllegalArgumentException] {
      audioFingerprint(Seq.empty[MediaRecord].toDS(), frames = 66)
    }
  }
}
