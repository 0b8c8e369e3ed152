package graft

import graft.ops.{Interop, Media}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Decoder independence, AUDIO leg: cross-validation against
  * `javax.sound.sampled` (the JDK's own RIFF/WAVE reader/writer — an
  * implementation this repo never sees). Mirrors ImageIoCrossSpec:
  *   - foreign streams in: AudioSystem-written WAVE files parse
  *     through [[Media.decodeWavBytes]] with identical format fields
  *     and byte-identical PCM;
  *   - this repo's streams out: [[Media.encodeWav]] containers decode
  *     identically under AudioSystem;
  *   - fail-loudly: the corruption classes the quarantine path injects
  *     are rejected by this repo's parser on AudioSystem-written
  *     streams too (header field validation is container-semantic, not
  *     encoder-idiosyncratic).
  */
class AudioSystemCrossSpec extends AnyFunSuite {

  private def srcBytes(rnd: Random): Array[Byte] =
    Array.fill(1 + rnd.nextInt(700))(rnd.nextInt(256).toByte)

  test("audiosystem-written WAVE parses with identical fields and PCM") {
    val rnd = new Random(4301)
    (0 until 80).foreach { _ =>
      val src = srcBytes(rnd)
      val foreign = Interop.audioSystemWavBytes(src)
      val (ch, sr, n, pcm) = Media.decodeWavBytes(foreign)
      val l = src.length
      assert(ch == 1 + l % 2 && sr == 8000 + (l % 8) * 1000 &&
        n == 64 + l % 512)
      val expect = Array.tabulate(n * ch * 2)(i => src(i % l))
      assert(java.util.Arrays.equals(pcm, expect))
    }
  }

  test("this repo's WAVE decodes identically under AudioSystem") {
    val rnd = new Random(4302)
    (0 until 80).foreach { _ =>
      val src = srcBytes(rnd)
      val ours = Media.encodeWav(src)
      val (fch, fsr, fn, fpcm) = Interop.audioSystemDecodeWav(ours)
      val (ch, sr, n, pcm) = Media.decodeWavBytes(ours)
      assert(fch == ch && fsr == sr && fn == n)
      assert(java.util.Arrays.equals(fpcm, pcm))
    }
  }

  test("container bytes agree byte-for-byte on the canonical header") {
    // Not required by the cross-validation contract (only the DECODE
    // must agree), but the JDK writer happens to emit the same
    // canonical 44-byte PCM layout — if this ever diverges (e.g. the
    // writer starts adding a fact chunk) the decode tests above are
    // the contract and this test documents the divergence point.
    val rnd = new Random(4303)
    (0 until 20).foreach { _ =>
      val src = srcBytes(rnd)
      assert(java.util.Arrays.equals(
        Interop.audioSystemWavBytes(src), Media.encodeWav(src)))
    }
  }

  test("fail-loudly holds on foreign streams: truncation, magic smash") {
    val rnd = new Random(4304)
    (0 until 30).foreach { _ =>
      val b = Interop.audioSystemWavBytes(srcBytes(rnd))
      val half = java.util.Arrays.copyOf(b, math.max(1, b.length / 2))
      intercept[IllegalArgumentException](Media.decodeWavBytes(half))
      val smashed = b.clone(); smashed(0) = 0xDE.toByte; smashed(1) = 0xAD.toByte
      intercept[IllegalArgumentException](Media.decodeWavBytes(smashed))
      val tiny = java.util.Arrays.copyOf(b, 7)
      intercept[IllegalArgumentException](Media.decodeWavBytes(tiny))
    }
  }

  test("AudioSystem rejects what this repo rejects (truncated stream)") {
    val rnd = new Random(4305)
    (0 until 10).foreach { _ =>
      val b = Media.encodeWav(srcBytes(rnd))
      // a sub-header cut is undecodable for both parsers
      val cut = java.util.Arrays.copyOf(b, 11)
      intercept[IllegalArgumentException](Interop.audioSystemDecodeWav(cut))
      intercept[IllegalArgumentException](Media.decodeWavBytes(cut))
    }
  }
}
