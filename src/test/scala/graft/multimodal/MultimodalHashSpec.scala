package graft.multimodal

import graft.SparkSpec

/** Round-4 multimodal fingerprints: perceptual image dHash + banded
  * near-dup pairs, and audio quality-gate stats. */
class MultimodalHashSpec extends SparkSpec {
  import spark.implicits._

  /** w x h 24-bit bottom-up BMP with per-pixel colors from `f(x, y)` where
    * y counts from the image TOP (the builder writes rows bottom-up). */
  private def pixelBmp(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val pixelOff = 54
    val buf = java.nio.ByteBuffer.allocate(pixelOff + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(pixelOff + rowBytes * h).putInt(0).putInt(pixelOff)
    buf.putInt(40).putInt(w).putInt(h)
    buf.putShort(1).putShort(24).putInt(0)
    buf.putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up: write image row h-1 first
    (0 until h).reverse.foreach { y =>
      (0 until w).foreach { x =>
        val (r, g, b) = f(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      (w * 3 until rowBytes).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  private def gradient(w: Int = 18, h: Int = 16, shift: Int = 0): Array[Byte] =
    pixelBmp(w, h)((x, _) => { val v = (x * 10 + shift) min 255; (v, v, v) })

  private def reverseGradient(w: Int = 18, h: Int = 16): Array[Byte] =
    pixelBmp(w, h)((x, _) => { val v = ((w - 1 - x) * 10) min 255; (v, v, v) })

  test("dHash: left-to-right gradient sets every bit; solid image sets none") {
    assert(Multimodal.BmpDHasher.dhash(gradient()).contains(-1L)) // all 64 bits
    val solid = pixelBmp(18, 16)((_, _) => (77, 77, 77))
    assert(Multimodal.BmpDHasher.dhash(solid).contains(0L))
  }

  test("dHash survives global brightness shift and nearest-neighbor resize") {
    val base = Multimodal.BmpDHasher.dhash(gradient()).get
    assert(Multimodal.BmpDHasher.dhash(gradient(shift = 20)).get == base)
    val doubled = Multimodal.BmpResizer.resize(gradient(), 36, 32).get
    assert(Multimodal.BmpDHasher.dhash(doubled).get == base)
  }

  test("dHash: images smaller than the 9x8 grid and malformed payloads are skipped") {
    assert(Multimodal.BmpDHasher.dhash(pixelBmp(8, 8)((_, _) => (1, 2, 3))).isEmpty)
    assert(Multimodal.BmpDHasher.dhash(Array[Byte]('B', 'M', 0)).isEmpty)
  }

  test("imageNearDupPairs: shifted twin pairs at hamming 0; reverse gradient does not") {
    val media = Seq(
      (1L, gradient()),
      (2L, gradient(shift = 20)),     // perceptual twin
      (3L, reverseGradient())         // opposite structure
    ).toDF("media_id", "content")
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
  }

  private def wavOf(samples: Seq[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }

  test("audioQualityStats: silence / clip ratios and rms from real samples") {
    val samples = Seq[Short](0, 0, 0, 0, 32767, -32768, 16384, -16384)
    val media = Seq((1L, wavOf(samples)), (2L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "content")
    val rows = Multimodal.audioQualityStats(media).collect()
    assert(rows.length == 1) // malformed payload skipped
    val r = rows.head
    assert(r.getAs[Long]("n_samples") == 8L)
    assert(r.getAs[Double]("silence_ratio") == 0.5)
    assert(r.getAs[Double]("clip_ratio") == 0.25)
    val expectedRms = math.sqrt((2.0 * 1.0 + 2.0 * 0.25 +
      math.pow(32767.0 / 32768.0, 2)) / 8.0) // approx; exact recompute below
    val exact = math.sqrt(samples.map(s => { val f = s / 32768.0; f * f }).sum / 8.0)
    assert(math.abs(r.getAs[Double]("rms") - exact) < 1e-12, s"vs approx $expectedRms")
  }

  test("audioQualityStats: empty data chunk yields zero ratios, not NaN") {
    val r = Multimodal.WavQualityAnalyzer.analyze(1L, wavOf(Seq.empty), 328)
    assert(r.contains(Multimodal.AudioQuality(1L, 0L, 0.0, 0.0, 0.0)))
  }
}
