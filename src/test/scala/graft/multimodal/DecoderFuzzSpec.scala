package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Robustness fuzz for the pure-JVM binary parsers: every decoder must
  * return cleanly (Some or None) on arbitrary, truncated, or magic-prefixed
  * garbage — never throw, never read out of bounds. Seeded, deterministic. */
class DecoderFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def probeAll(bytes: Array[Byte]): Unit = {
    Multimodal.BmpImageDecoder.decode(1L, bytes)
    Multimodal.WavAudioDecoder.decode(1L, bytes)
    new Multimodal.WavSegmentEmbedder(4).decode(1L, bytes)
    new Multimodal.BmpGridEmbedder(2, 2).decode(1L, bytes)
    Multimodal.AviFrameExtractor.frames(bytes)
    Multimodal.BmpDHasher.dhash(bytes)
    Multimodal.WavQualityAnalyzer.analyze(1L, bytes, silenceAbs = 328)
    ()
  }

  test("decoders never throw on arbitrary bytes") {
    (1 to 120).foreach { _ =>
      val bytes = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(bytes)
      probeAll(bytes)
    }
  }

  test("decoders never throw on magic-prefixed garbage (deeper header paths)") {
    (1 to 60).foreach { _ =>
      val rest = new Array[Byte](60)
      rnd.nextBytes(rest)
      probeAll("RIFF".getBytes("US-ASCII") ++ rest)
      probeAll(Array[Byte]('B', 'M') ++ rest)
      probeAll("RIFF".getBytes("US-ASCII") ++ rest.take(4) ++
        "WAVE".getBytes("US-ASCII") ++ rest)
      probeAll("RIFF".getBytes("US-ASCII") ++ rest.take(4) ++
        "AVI ".getBytes("US-ASCII") ++ rest)
    }
  }
}
