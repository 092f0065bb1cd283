package graft.multimodal

/** Minimal REAL codecs for the multimodal decode path — byte-level
  * builders and parsers for public container formats:
  *
  *  - JPEG (ITU-T T.81): SOI marker walk, dimensions from the SOF0–SOF15
  *    frame header (big-endian height, width), entropy data skipped via
  *    FF-stuffing-aware scan to EOI.
  *  - PNG (RFC 2083): 8-byte signature + IHDR chunk (big-endian
  *    width/height), CRC32-verified exactly as a strict decoder would.
  *  - WAV (Microsoft RIFF): chunk walk to `fmt ` (little-endian
  *    channels / sample rate / block align) and `data`; sample-frame
  *    count = data size / block align.
  *  - MJPEG: the classic motion-JPEG stream — concatenated JPEG frames;
  *    frame boundaries come from the real marker walk, so every
  *    extracted frame is itself a valid standalone JPEG.
  *
  * The parsers accept any correctly-encoded file (they read the actual
  * container headers, not a fixture convention); the builders emit
  * minimal valid files (header + empty payload) used by synthetic
  * fixtures. Parse failures return None / empty rather than throwing:
  * at corpus scale one corrupt blob must degrade to a flagged row, not
  * kill the stage.
  */
object MediaCodecs {

  final case class ImageInfo(width: Int, height: Int)
  final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSampleFrames: Long)

  // ------------------------------------------------------------ sniffing

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == PngSig(i))

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && fourCc(b, 0) == "RIFF" && fourCc(b, 8) == "WAVE"

  // ------------------------------------------------------------- helpers

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def fourCc(b: Array[Byte], i: Int): String =
    if (b.length < i + 4) "" else new String(b, i, 4, "US-ASCII")

  // ---------------------------------------------------------------- JPEG

  /** Is `m` a start-of-frame marker carrying dimensions? SOF0–SOF15
    * minus the non-frame C4 (DHT), C8 (JPG), CC (DAC) — T.81 table B.1. */
  private def isSofMarker(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** Walks one JPEG image starting at `from` (which must point at SOI).
    * Returns (dims-if-seen, offset one past EOI) — the real T.81 §B.2
    * segment walk: length-prefixed marker segments, standalone RST/TEM
    * markers, and entropy-coded data after SOS skipped by scanning for a
    * marker that is not a stuffed 0x00 or RST. None if the structure is
    * not a JPEG (no SOI, truncated segment, no EOI). */
  def parseJpegFrame(b: Array[Byte], from: Int): Option[(Option[ImageInfo], Int)] = {
    if (from + 2 > b.length || u8(b, from) != 0xff || u8(b, from + 1) != 0xd8) return None
    var pos = from + 2
    var dims: Option[ImageInfo] = None
    while (pos + 2 <= b.length) {
      if (u8(b, pos) != 0xff) return None // marker expected
      // T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
      // fill bytes — skip the run so fill is not misread as a marker id
      while (pos + 2 <= b.length && u8(b, pos + 1) == 0xff) pos += 1
      if (pos + 2 > b.length) return None
      val m = u8(b, pos + 1)
      pos += 2
      if (m == 0xd9) return Some((dims, pos)) // EOI
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) () // TEM/RSTn: standalone
      else {
        if (pos + 2 > b.length) return None
        val len = be16(b, pos)
        if (len < 2 || pos + len > b.length) return None
        if (isSofMarker(m) && len >= 7)
          dims = Some(ImageInfo(width = be16(b, pos + 5), height = be16(b, pos + 3)))
        pos += len
        if (m == 0xda) { // SOS: entropy-coded data until next real marker
          while (pos + 1 < b.length &&
            !(u8(b, pos) == 0xff && u8(b, pos + 1) != 0x00 &&
              !(u8(b, pos + 1) >= 0xd0 && u8(b, pos + 1) <= 0xd7))) pos += 1
        }
      }
    }
    None // ran out of bytes before EOI
  }

  /** Dimensions of (the first frame of) a JPEG/MJPEG byte array. */
  def parseJpeg(b: Array[Byte]): Option[ImageInfo] =
    parseJpegFrame(b, 0).flatMap(_._1)

  /** Frame boundaries [start, end) of an MJPEG stream — concatenated
    * JPEGs back to back. A single JPEG yields one frame. Trailing bytes
    * that are not another SOI end the walk (trailing junk tolerated,
    * like real MJPEG readers). */
  def mjpegFrameOffsets(b: Array[Byte]): IndexedSeq[(Int, Int)] = {
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var pos = 0
    var ok = true
    while (ok && pos + 2 <= b.length && u8(b, pos) == 0xff && u8(b, pos + 1) == 0xd8) {
      parseJpegFrame(b, pos) match {
        case Some((_, end)) => out += ((pos, end)); pos = end
        case None => ok = false
      }
    }
    out.result()
  }

  /** Header-only baseline JPEG: SOI + SOF0 (3 components, 8-bit) + EOI —
    * 23 bytes; enough for any dimension-sniffing decoder, no scan data. */
  def jpegBytes(width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && width <= 0xffff && height >= 1 && height <= 0xffff,
      s"JPEG dims are u16, got ${width}x$height")
    val out = new java.io.ByteArrayOutputStream(23)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    w8(0xff); w8(0xd8)              // SOI
    w8(0xff); w8(0xc0); w16(17)     // SOF0, len = 8 + 3*3
    w8(8); w16(height); w16(width)  // precision, Y, X
    w8(3)                           // 3 components
    w8(1); w8(0x22); w8(0)          // Y:  2x2 sampling, qtable 0
    w8(2); w8(0x11); w8(1)          // Cb: 1x1, qtable 1
    w8(3); w8(0x11); w8(1)          // Cr
    w8(0xff); w8(0xd9)              // EOI
    out.toByteArray
  }

  /** MJPEG stream of `nFrames` identical header-only frames. */
  def mjpegBytes(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    require(nFrames >= 1, s"need at least one frame, got $nFrames")
    val one = jpegBytes(width, height)
    val out = new Array[Byte](one.length * nFrames)
    (0 until nFrames).foreach(i => System.arraycopy(one, 0, out, i * one.length, one.length))
    out
  }

  // ----------------------------------------------------------------- PNG

  /** IHDR of a PNG, CRC-checked. */
  def parsePng(b: Array[Byte]): Option[ImageInfo] = {
    if (!isPng(b) || b.length < 33) return None
    if (be32(b, 8) != 13L || fourCc(b, 12) != "IHDR") return None
    val crc = new java.util.zip.CRC32()
    crc.update(b, 12, 17) // type + 13 data bytes
    if (crc.getValue != be32(b, 29)) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(ImageInfo(w.toInt, h.toInt))
  }

  /** Minimal valid PNG: signature + IHDR (8-bit truecolor, real CRC32) +
    * IEND — 45 bytes. No IDAT: dimension metadata only, like the JPEG
    * builder. */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && height >= 1, s"PNG dims must be positive, got ${width}x$height")
    val out = new java.io.ByteArrayOutputStream(45)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w32(v: Long): Unit = { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }
    out.write(PngSig)
    val ihdr = new java.io.ByteArrayOutputStream(17)
    ihdr.write("IHDR".getBytes("US-ASCII"))
    def h32(v: Long): Unit = { ihdr.write((v >> 24).toInt & 0xff); ihdr.write((v >> 16).toInt & 0xff); ihdr.write((v >> 8).toInt & 0xff); ihdr.write(v.toInt & 0xff) }
    h32(width); h32(height)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    val ihdrBytes = ihdr.toByteArray
    val crc = new java.util.zip.CRC32()
    crc.update(ihdrBytes)
    w32(13L); out.write(ihdrBytes); w32(crc.getValue)
    w32(0L); out.write("IEND".getBytes("US-ASCII"))
    val crc2 = new java.util.zip.CRC32()
    crc2.update("IEND".getBytes("US-ASCII"))
    w32(crc2.getValue)
    out.toByteArray
  }

  // ----------------------------------------------------------------- PPM

  def isPpm(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'P' && b(1) == '6'

  private def isPpmWs(c: Byte): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t'

  /** Header of a binary Netpbm PPM (P6): "P6" ws width ws height ws
    * maxval, ONE whitespace byte, then the w·h·3 raster. `#` comments
    * inside the header are skipped per the spec. Returns (dims, raster
    * offset); None on malformed header, maxval ≠ 255, or a short
    * raster. */
  def parsePpm(b: Array[Byte]): Option[(ImageInfo, Int)] = {
    if (!isPpm(b)) return None
    var pos = 2
    def skipWs(): Boolean = {
      val start = pos
      var go = true
      while (go && pos < b.length) {
        if (isPpmWs(b(pos))) pos += 1
        else if (b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else go = false
      }
      pos > start
    }
    def readInt(): Long = {
      var v = 0L
      var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (b(pos) - '0'); pos += 1; any = true
      }
      if (any) v else -1L
    }
    if (!skipWs()) return None
    val w = readInt(); if (w < 1 || w > Int.MaxValue) return None
    if (!skipWs()) return None
    val h = readInt(); if (h < 1 || h > Int.MaxValue) return None
    if (!skipWs()) return None
    if (readInt() != 255L) return None
    if (pos >= b.length || !isPpmWs(b(pos))) return None // exactly one ws, then raster
    pos += 1
    if (b.length - pos < 3L * w * h) return None
    Some((ImageInfo(w.toInt, h.toInt), pos))
  }

  /** Binary P6 PPM with pixels from `pix(x, y) = (r, g, b)` (each
    * channel 0–255). */
  def ppmBytes(width: Int, height: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width >= 1 && height >= 1, s"PPM dims must be positive, got ${width}x$height")
    require(3L * width * height < Int.MaxValue - 64,
      s"raster ${width}x$height overflows a byte array")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var o = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, bl) = pix(x, y)
        out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = bl.toByte
        o += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** REAL nearest-neighbor resample of a P6 raster to `dw`×`dh`:
    * output pixel (x, y) copies source pixel (⌊x·w/dw⌋, ⌊y·h/dh⌋) —
    * floor mapping, pure integer arithmetic, so an oracle can replay
    * every output byte. */
  def resizePpmNearest(b: Array[Byte], dw: Int, dh: Int): Option[Array[Byte]] = {
    require(dw >= 1 && dh >= 1, s"target dims must be positive, got ${dw}x$dh")
    require(3L * dw * dh < Int.MaxValue - 64,
      s"target raster ${dw}x$dh overflows a byte array")
    parsePpm(b).map { case (info, off) =>
      val header = s"P6\n$dw $dh\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + 3 * dw * dh)
      System.arraycopy(header, 0, out, 0, header.length)
      var o = header.length
      var y = 0
      while (y < dh) {
        val sy = (y.toLong * info.height / dh).toInt
        var x = 0
        while (x < dw) {
          val sx = (x.toLong * info.width / dw).toInt
          val so = off + 3 * (sy * info.width + sx)
          out(o) = b(so); out(o + 1) = b(so + 1); out(o + 2) = b(so + 2)
          o += 3; x += 1
        }
        y += 1
      }
      out
    }
  }

  // ----------------------------------------------------------------- WAV

  /** fmt + data chunks of a RIFF/WAVE file (chunk walk, LE fields).
    * Chunk sizes are u32 and attacker-controlled: the walk advances in
    * Long so a corrupt size near 2³² cannot overflow the position into
    * a negative index (which would throw, or worse loop) — it just ends
    * the walk and the file flags as unparseable. */
  def parseWav(b: Array[Byte]): Option[WavInfo] = {
    if (!isWav(b)) return None
    var pos = 12
    var channels, rate, bits, blockAlign = -1
    var dataSize = -1L
    var go = true
    while (go && pos + 8 <= b.length) {
      val cc = fourCc(b, pos)
      val size = le32(b, pos + 4)
      if (cc == "fmt " && size >= 16 && pos + 8 + 16 <= b.length) {
        channels = le16(b, pos + 10)
        rate = le32(b, pos + 12).toInt
        blockAlign = le16(b, pos + 20)
        bits = le16(b, pos + 22)
      } else if (cc == "data")
        // the declared size is attacker-controlled: clamp to the bytes
        // actually present so a corrupt near-2^32 claim yields the real
        // (possibly zero) frame count instead of a wrapped Long
        dataSize = math.min(size, (b.length - (pos + 8)).toLong)
      val next = pos.toLong + 8L + size + (size & 1L) // chunks are word-aligned
      if (next > Int.MaxValue) go = false else pos = next.toInt
    }
    if (channels < 1 || blockAlign < 1 || dataSize < 0) None
    else Some(WavInfo(channels, rate, bits, dataSize / blockAlign))
  }

  /** Mono 16-bit PCM WAV carrying REAL sample data (LE, canonical
    * 44-byte header) — the audio twin of [[ppmBytes]]: fixtures get
    * actual PCM the feature extractor can do arithmetic on. */
  def wavPcmBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate >= 1, s"sample rate must be positive, got $sampleRate")
    val dataSize = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36L + dataSize)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16L)
    w16(1); w16(1); w32(sampleRate.toLong)
    w32(sampleRate.toLong * 2); w16(2); w16(16)
    out.write("data".getBytes("US-ASCII")); w32(dataSize.toLong)
    samples.foreach(s => w16(s.toInt))
    out.toByteArray
  }

  /** Channel-0 sample values of a 16-bit PCM WAV, sign-extended to Int —
    * the decode step feature extraction runs on. Any channel count (the
    * first sample of each frame is read); None when the container or
    * sample format is not 16-bit PCM. Data size is clamped to the bytes
    * present, same policy as [[parseWav]]. */
  def wavChannel0Samples(b: Array[Byte]): Option[Array[Int]] = {
    if (!isWav(b)) return None
    var pos = 12
    var blockAlign, bits = -1
    var dataOff, dataLen = -1
    var go = true
    while (go && pos + 8 <= b.length) {
      val cc = fourCc(b, pos)
      val size = le32(b, pos + 4)
      if (cc == "fmt " && size >= 16 && pos + 8 + 16 <= b.length) {
        blockAlign = le16(b, pos + 20)
        bits = le16(b, pos + 22)
      } else if (cc == "data") {
        dataOff = pos + 8
        dataLen = math.min(size, (b.length - dataOff).toLong).toInt
      }
      val next = pos.toLong + 8L + size + (size & 1L)
      if (next > Int.MaxValue) go = false else pos = next.toInt
    }
    if (bits != 16 || blockAlign < 2 || dataOff < 0) None
    else Some(Array.tabulate(dataLen / blockAlign) { f =>
      val v = le16(b, dataOff + f * blockAlign)
      if (v >= 0x8000) v - 0x10000 else v
    })
  }

  /** Canonical 44-byte-header PCM WAV with `nSampleFrames` zero frames. */
  def wavBytes(channels: Int, sampleRate: Int, bitsPerSample: Int, nSampleFrames: Int): Array[Byte] = {
    require(channels >= 1 && sampleRate >= 1 && bitsPerSample % 8 == 0 && nSampleFrames >= 0,
      s"bad WAV params: ch=$channels rate=$sampleRate bits=$bitsPerSample frames=$nSampleFrames")
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSampleFrames * blockAlign
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36L + dataSize)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16L)
    w16(1); w16(channels); w32(sampleRate.toLong)
    w32(sampleRate.toLong * blockAlign); w16(blockAlign); w16(bitsPerSample)
    out.write("data".getBytes("US-ASCII")); w32(dataSize.toLong)
    out.write(new Array[Byte](dataSize))
    out.toByteArray
  }
}
