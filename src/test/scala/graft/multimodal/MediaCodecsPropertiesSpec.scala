package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property round-trips for the media codecs: whatever the builders can
  * encode, the parsers must recover exactly — across the full dimension
  * ranges (u16 for JPEG, u32-ish for PNG, arbitrary channel/rate/frame
  * combos for WAV, any frame count for MJPEG). Raw ScalaCheck
  * generators with fixed seeds, same idiom as SearchPropertiesSpec. */
class MediaCodecsPropertiesSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(7000L + i)))

  test("JPEG dims round-trip over the whole u16 range") {
    val gen = for {
      w <- Gen.choose(1, 0xffff)
      h <- Gen.choose(1, 0xffff)
    } yield (w, h)
    samples(gen, 100).foreach { case (w, h) =>
      assert(MediaCodecs.parseJpeg(MediaCodecs.jpegBytes(w, h))
        .contains(MediaCodecs.ImageInfo(w, h)), s"JPEG ${w}x$h")
    }
  }

  test("PNG dims round-trip past the u16 boundary (u32 fields + CRC)") {
    val gen = for {
      w <- Gen.choose(1, 1 << 20)
      h <- Gen.choose(1, 1 << 20)
    } yield (w, h)
    samples(gen, 100).foreach { case (w, h) =>
      assert(MediaCodecs.parsePng(MediaCodecs.pngBytes(w, h))
        .contains(MediaCodecs.ImageInfo(w, h)), s"PNG ${w}x$h")
    }
  }

  test("WAV fmt/data round-trip over channel/rate/bits/frame combos") {
    val gen = for {
      ch <- Gen.choose(1, 8)
      rate <- Gen.oneOf(8000, 16000, 22050, 44100, 48000)
      bits <- Gen.oneOf(8, 16, 24, 32)
      frames <- Gen.choose(0, 2000)
    } yield (ch, rate, bits, frames)
    samples(gen, 100).foreach { case (ch, rate, bits, frames) =>
      val parsed = MediaCodecs.parseWav(MediaCodecs.wavBytes(ch, rate, bits, frames))
      assert(parsed.contains(MediaCodecs.WavInfo(ch, rate, bits, frames.toLong)),
        s"WAV ch=$ch rate=$rate bits=$bits frames=$frames → $parsed")
    }
  }

  test("MJPEG frame walk recovers every frame count and every span parses standalone") {
    val gen = for {
      w <- Gen.choose(1, 4096)
      h <- Gen.choose(1, 4096)
      nf <- Gen.choose(1, 32)
    } yield (w, h, nf)
    samples(gen, 50).foreach { case (w, h, nf) =>
      val stream = MediaCodecs.mjpegBytes(w, h, nf)
      val offs = MediaCodecs.mjpegFrameOffsets(stream)
      assert(offs.length == nf, s"MJPEG ${w}x$h nf=$nf got ${offs.length}")
      offs.foreach { case (s, e) =>
        val frame = java.util.Arrays.copyOfRange(stream, s, e)
        assert(MediaCodecs.parseJpeg(frame).contains(MediaCodecs.ImageInfo(w, h)))
      }
    }
  }
}
