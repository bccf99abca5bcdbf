package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The fused single-walk extractors must be BIT-IDENTICAL to the separate
  * walkers they replace in extractFeatures — same cell maps, same
  * accumulation order, same gates — across structured fixtures, top-down
  * rows, multi-channel audio, partial frames, and seeded random payloads. */
class FusedDecodeSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)

  private def bmp(w: Int, h: Int, topDown: Boolean = false)(
      f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val buf = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(if (topDown) -h else h)
    buf.putShort(1).putShort(24).putInt(0)
    buf.putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val rows = if (topDown) 0 until h else (0 until h).reverse
    rows.foreach { y =>
      (0 until w).foreach { x =>
        val (r, g, b) = f(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      (w * 3 until rowBytes).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  private def wav(samples: Array[Short], channels: Int = 1,
                  rate: Int = 8000): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * 2 * channels).putShort((2 * channels).toShort).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }

  private def imageFixtures: Seq[Array[Byte]] = Seq(
    bmp(18, 16)((x, _) => { val v = (x * 10) min 255; (v, v, v) }),
    bmp(18, 16, topDown = true)((x, y) => ((x * 7 + y) min 255, x, y min 255)),
    bmp(31, 9)((x, y) => (x * 5 min 255, y * 20 min 255, (x + y) min 255)), // odd width: row padding
    bmp(18, 16)((_, _) => (90, 90, 90)),                                   // solid -> dhash 0
    bmp(8, 8)((x, y) => (x, y, x + y)),                                    // under the 9x8 grid
    bmp(2, 2)((x, y) => (x * 200, y * 200, 0)),
    Array[Byte]('B', 'M', 1, 2, 3)                                         // malformed
  ) ++ (1 to 10).map { _ =>
    bmp(9 + rnd.nextInt(12), 8 + rnd.nextInt(12))((_, _) =>
      (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
  }

  private def audioFixtures: Seq[Array[Byte]] = Seq(
    wav(Array.tabulate(4000)(i => (if (i % 2 == 0) 8000 else -8000).toShort)),
    wav(Array.fill(1000)(50.toShort)),
    wav(Array.tabulate(999)(i => (i % 3000).toShort), channels = 2), // odd -> partial frame
    wav(Array.tabulate(300)(i => (i * 100 - 15000).toShort), channels = 3),
    wav(Array.empty[Short]),                                        // empty data chunk
    "RIFFjunk".getBytes("US-ASCII")                                 // malformed
  ) ++ (1 to 10).map { _ =>
    wav(Array.fill(100 + rnd.nextInt(500))((rnd.nextInt(65536) - 32768).toShort),
      channels = 1 + rnd.nextInt(3))
  }

  test("FusedBmpExtractor == BmpDHasher + BmpGridEmbedder on every fixture") {
    val fused = new Multimodal.FusedBmpExtractor(4, 4)
    val grid = new Multimodal.BmpGridEmbedder(4, 4)
    imageFixtures.zipWithIndex.foreach { case (bytes, i) =>
      val (dh, emb) = fused.extract(bytes)
      assert(dh === Multimodal.BmpDHasher.dhash(bytes), s"dhash, fixture $i")
      assert(emb.map(_.toSeq) ===
        grid.decode(1L, bytes).map(_.embedding.toSeq), s"embedding, fixture $i")
    }
  }

  test("FusedWavExtractor == WavQualityAnalyzer + WavSegmentEmbedder on every fixture") {
    val fused = new Multimodal.FusedWavExtractor(16, silenceAbs = 327)
    val seg = new Multimodal.WavSegmentEmbedder(16)
    audioFixtures.zipWithIndex.foreach { case (bytes, i) =>
      val (q, emb) = fused.extract(9L, bytes)
      assert(q === Multimodal.WavQualityAnalyzer.analyze(9L, bytes, silenceAbs = 327),
        s"quality, fixture $i")
      assert(emb.map(_.toSeq) === seg.decode(9L, bytes).map(_.embedding.toSeq),
        s"embedding, fixture $i")
    }
  }

  test("fused extractors never throw on arbitrary bytes (fuzz parity)") {
    val fi = new Multimodal.FusedBmpExtractor(2, 2)
    val fa = new Multimodal.FusedWavExtractor(4, silenceAbs = 328)
    (1 to 120).foreach { _ =>
      val bytes = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(bytes)
      fi.extract(bytes); fa.extract(1L, bytes)
      fi.extract("BM".getBytes("US-ASCII") ++ bytes)
      fa.extract(1L, "RIFF".getBytes("US-ASCII") ++ bytes)
    }
  }
}
