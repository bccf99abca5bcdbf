package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = {
    val rows = Seq(
      Row(1L, "image", "fake-jpeg-bytes-1".getBytes("UTF-8"),
        Row("image/jpeg", 640, 480, null, null)),
      Row(2L, "image", "fake-jpeg-bytes-2".getBytes("UTF-8"),
        Row("image/jpeg", 800, 600, null, null)),
      Row(3L, "image", Array.empty[Byte], Row("image/jpeg", 0, 0, null, null)), // dropped
      Row(4L, "video", ("frame0" * 10 + "frame1" * 10 + "frame2" * 10).getBytes("UTF-8"),
        Row("video/mp4", 1920, 1080, null, 5000L)),
      Row(5L, "audio", ("pcm" * 100).getBytes("UTF-8"),
        Row("audio/wav", null, null, 16000, 2000L)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("decodeImages: batched decode seam, schema contract, empty rows dropped") {
    val out = Multimodal.decodeImages(media)
    assert(out.columns.toSeq == Seq("media_id", "width", "height", "channels", "embedding"))
    val got = out.collect().map(r => r.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L, 5L)) // empty-content row 3 dropped
  }

  test("decodeImages is deterministic across runs (retry safety)") {
    val a = Multimodal.decodeImages(media).orderBy("media_id").collect().toSeq.map(_.toString)
    val b = Multimodal.decodeImages(media).orderBy("media_id").collect().toSeq.map(_.toString)
    assert(a == b)
  }

  test("decode runs narrow: partition count preserved, no shuffle") {
    val out = Multimodal.decodeImages(media)
    assert(out.rdd.getNumPartitions == media.rdd.getNumPartitions)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("sampleFrames: every-nth chunking of the video payload") {
    val frames = Multimodal.sampleFrames(media, chunkBytes = 60, everyNth = 2)
    val idx = frames.select("chunk_idx").as[Int].collect().toSeq.sorted
    assert(idx == Seq(0, 2)) // 180 bytes / 60 = 3 chunks, keep 0 and 2
    val f0 = new String(frames.filter(col("chunk_idx") === 0).head().getAs[Array[Byte]]("frame"), "UTF-8")
    assert(f0 == "frame0" * 10)
  }

  test("audioWindows: windowed rows with deterministic energy in [0,1]") {
    val w = Multimodal.audioWindows(media, windowBytes = 100)
    val rows = w.collect()
    assert(rows.length == 3) // 300 bytes / 100
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  /** Hand-built 2x2 24-bit bottom-up BMP: top row red+green, bottom row
    * blue+white. Row stride = 8 (2*3 padded to 4-byte boundary). */
  private def tinyBmp: Array[Byte] = {
    val rowBytes = 8
    val pixelOff = 54
    val size = pixelOff + rowBytes * 2
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(pixelOff)
    b.putInt(40).putInt(2).putInt(2) // BITMAPINFOHEADER, w=2, h=2 (bottom-up)
    b.putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
    b.putInt(rowBytes * 2).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up: file row 0 = image BOTTOM row: blue(0,0,255), white — BGR order
    b.put(Array[Byte](255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte, 0, 0))
    // file row 1 = image TOP row: red(255,0,0), green(0,255,0)
    b.put(Array[Byte](0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0))
    b.array()
  }

  test("BmpImageDecoder decodes real pixels: dims, channel means, quadrants") {
    val f = Multimodal.BmpImageDecoder.decode(7L, tinyBmp).get
    assert(f.width == 2 && f.height == 2 && f.channels == 3)
    // pixels: top (255,0,0),(0,255,0); bottom (0,0,255),(255,255,255)
    assert(math.abs(f.embedding(0) - 0.5f) < 1e-6) // mean R = (255+0+0+255)/4/255
    assert(math.abs(f.embedding(1) - 0.5f) < 1e-6) // mean G
    assert(math.abs(f.embedding(2) - 0.5f) < 1e-6) // mean B
    assert(math.abs(f.embedding(4) - 1f / 3f) < 1e-6) // top-left = red brightness
    assert(math.abs(f.embedding(7) - 1.0f) < 1e-6)    // bottom-right = white
    // malformed and non-BMP payloads are skipped, not thrown
    assert(Multimodal.BmpImageDecoder.decode(8L, Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.BmpImageDecoder.decode(9L, tinyBmp.take(40)).isEmpty)
  }

  test("decoders reject crafted overflow headers instead of reading out of bounds") {
    // BMP declaring width 0x40000000: Int row arithmetic would wrap negative
    val bigW = tinyBmp.clone()
    val bw = java.nio.ByteBuffer.wrap(bigW).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bw.putInt(18, 0x40000000)
    assert(Multimodal.BmpImageDecoder.decode(1L, bigW).isEmpty)
    // height = Int.MinValue: abs() stays negative in Int
    val minH = tinyBmp.clone()
    java.nio.ByteBuffer.wrap(minH).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue)
    assert(Multimodal.BmpImageDecoder.decode(2L, minH).isEmpty)
    // WAV declaring a data chunk of ~Int.MaxValue bytes: off+8+size wraps
    val bigChunk = tinyWav.clone()
    java.nio.ByteBuffer.wrap(bigChunk).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 0x7ffffff0)
    assert(Multimodal.WavAudioDecoder.decode(3L, bigChunk).isEmpty)
  }

  test("decodeImages with the real BMP decoder over the binary column") {
    val bmpMedia = Seq((1L, tinyBmp), (2L, Array[Byte](9, 9))).toDF("media_id", "content")
    val out = Multimodal.decodeImages(bmpMedia, Multimodal.BmpImageDecoder)
    assert(out.count() == 1) // malformed row skipped
    assert(out.head().getAs[Int]("width") == 2)
  }

  /** Hand-built RIFF/AVI: LIST/movi with two raw video frames ('00db', one
    * odd-sized to exercise even padding), one compressed frame ('00dc'),
    * and an audio chunk ('01wb') that must be skipped. */
  private def tinyAvi: Array[Byte] = {
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1
      val b = java.nio.ByteBuffer.allocate(8 + data.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc.getBytes("US-ASCII")).putInt(data.length).put(data)
      b.array()
    }
    val sub = chunk("00db", Array[Byte](1, 2, 3)) ++ chunk("01wb", Array[Byte](9, 9)) ++
      chunk("00dc", Array[Byte](4, 5, 6, 7)) ++ chunk("00db", Array[Byte](7, 8, 9))
    val movi = java.nio.ByteBuffer.allocate(12 + sub.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    movi.put("LIST".getBytes("US-ASCII")).putInt(4 + sub.length)
      .put("movi".getBytes("US-ASCII")).put(sub)
    val body = movi.array()
    val riff = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    riff.array()
  }

  test("AviFrameExtractor: real demux — video chunks in order, audio skipped, malformed empty") {
    val fs = Multimodal.AviFrameExtractor.frames(tinyAvi)
    assert(fs.map(_._1) == Seq(0, 1, 2))
    def bytesOf(f: (Int, Int, Int)) = tinyAvi.slice(f._2, f._2 + f._3).toSeq
    assert(bytesOf(fs(0)) == Seq[Byte](1, 2, 3))      // raw frame, odd size
    assert(bytesOf(fs(1)) == Seq[Byte](4, 5, 6, 7))   // compressed frame kept as bytes
    assert(bytesOf(fs(2)) == Seq[Byte](7, 8, 9))
    assert(Multimodal.AviFrameExtractor.frames(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.AviFrameExtractor.frames(tinyAvi.take(30)).isEmpty)
    // crafted chunk size past the buffer: truncated walk, no out-of-bounds
    val crafted = tinyAvi.clone()
    java.nio.ByteBuffer.wrap(crafted).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(28, 0x7ffffff0) // first subchunk's declared size (12 RIFF + 12 LIST/movi + 4cc)
    assert(Multimodal.AviFrameExtractor.frames(crafted).isEmpty)

    import spark.implicits._
    val media = Seq((1L, "video", tinyAvi), (2L, "video", Array[Byte](0, 1)),
      (3L, "audio", tinyAvi)).toDF("media_id", "modality", "content")
    val out = Multimodal.sampleFramesAvi(media, everyNth = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq))
    // every 2nd frame of media 1 only: idx 0 and 2
    assert(out.toSet == Set((1L, 0, Seq[Byte](1, 2, 3)), (1L, 2, Seq[Byte](7, 8, 9))))
  }

  test("BmpResizer: real nearest-neighbor pixels, upscale preserves means, 1x1 picks top-left") {
    // 2x2 -> 4x4: every source pixel duplicated 2x2, so channel means and
    // quadrant brightnesses are EXACTLY those of the source
    val up = Multimodal.BmpResizer.resize(tinyBmp, 4, 4).get
    val f4 = Multimodal.BmpImageDecoder.decode(1L, up).get
    val f2 = Multimodal.BmpImageDecoder.decode(1L, tinyBmp).get
    assert(f4.width == 4 && f4.height == 4)
    assert(f4.embedding.toSeq == f2.embedding.toSeq)
    // 2x2 -> 1x1: nearest maps (0,0) -> source top-left = pure red
    val one = Multimodal.BmpResizer.resize(tinyBmp, 1, 1).get
    val f1 = Multimodal.BmpImageDecoder.decode(1L, one).get
    assert(f1.width == 1 && f1.height == 1)
    assert(f1.embedding(0) == 1.0f && f1.embedding(1) == 0.0f && f1.embedding(2) == 0.0f)
    // same-size resize round-trips the canonical encoding byte-for-byte
    assert(Multimodal.BmpResizer.resize(tinyBmp, 2, 2).get.toSeq == tinyBmp.toSeq)
    // malformed payloads are skipped, and the DataFrame op mirrors that
    assert(Multimodal.BmpResizer.resize(Array[Byte](1, 2), 2, 2).isEmpty)
    import spark.implicits._
    val media = Seq((1L, tinyBmp), (2L, Array[Byte](9, 9))).toDF("media_id", "content")
    val resized = Multimodal.resizeImages(media, 3, 3)
    assert(resized.count() == 1)
    val r = resized.head()
    assert(r.getAs[Int]("width") == 3 &&
      Multimodal.BmpImageDecoder.decode(1L, r.getAs[Array[Byte]]("content")).get.width == 3)
  }

  /** 16-bit PCM mono WAV, 8000 Hz, 4 frames of constant +16384 (rms 0.5). */
  private def tinyWav: Array[Byte] = {
    val nFrames = 4
    val dataSize = nFrames * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    (1 to nFrames).foreach(_ => b.putShort(16384))
    b.array()
  }

  test("WavAudioDecoder decodes real PCM: rate, frames, duration, rms") {
    val a = Multimodal.WavAudioDecoder.decode(3L, tinyWav).get
    assert(a.sample_rate == 8000 && a.channels == 1 && a.n_frames == 4L)
    assert(a.duration_ms == 0L) // 4 frames @ 8 kHz = 0.5 ms, floors to 0
    assert(math.abs(a.rms - 0.5) < 1e-9) // constant 16384/32768
    assert(Multimodal.WavAudioDecoder.decode(4L, Array[Byte](1)).isEmpty)
    val audioMedia = Seq((5L, tinyWav)).toDF("media_id", "content")
    val out = Multimodal.decodeAudio(audioMedia)
    assert(out.head().getAs[Double]("rms") > 0.49)
  }

  /** Solid-color w x h 24-bit bottom-up BMP. */
  private def solidBmp(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val pixelOff = 54
    val buf = java.nio.ByteBuffer.allocate(pixelOff + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(pixelOff + rowBytes * h).putInt(0).putInt(pixelOff)
    buf.putInt(40).putInt(w).putInt(h)
    buf.putShort(1).putShort(24).putInt(0)
    buf.putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until h).foreach { _ =>
      (0 until w).foreach(_ => buf.put(b.toByte).put(g.toByte).put(r.toByte))
      (w * 3 until rowBytes).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  test("BmpGridEmbedder pools real pixels: 2x2 grid of a 2x2 image IS its corners") {
    val e = new Multimodal.BmpGridEmbedder(2, 2).decode(1L, tinyBmp).get.embedding
    // cells row-major from the TOP, RGB within cell: red, green, blue, white
    assert(e.map(v => math.round(v)).toSeq ==
      Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f, 1f, 1f, 1f, 1f).map(v => math.round(v)))
    // malformed payloads skip, same policy as the 8-dim decoder
    assert(new Multimodal.BmpGridEmbedder(2, 2).decode(2L, Array[Byte](1, 2)).isEmpty)
  }

  test("imageEmbeddings feed the similarity stack: nearest neighbor is the near-dup image") {
    val media = Seq(
      (1L, solidBmp(8, 6, 200, 10, 10)),  // red-ish
      (2L, solidBmp(4, 4, 190, 20, 15)),  // near-dup of 1 (different size!)
      (3L, solidBmp(8, 8, 10, 10, 220))   // blue
    ).toDF("media_id", "content")
    val emb = Multimodal.imageEmbeddings(media, gridW = 2, gridH = 2)
    assert(emb.count() == 3)
    val probe = emb.filter(col("media_id") === 1L)
    val nn = graft.operators.Similarity.knnJoin(emb, "media_id", "embedding",
      probe, "media_id", "embedding", k = 1, excludeSelf = true)
      .head()
    assert(nn.getLong(1) == 2L) // the other red image, despite different dims
  }

  /** Mono 16-bit 8 kHz WAV with the given samples. */
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

  test("WavSegmentEmbedder pools real samples into an energy envelope") {
    // loud first half (half scale), silent second half, 4 slices over 8 frames
    val samples = Seq.fill(4)(16384.toShort) ++ Seq.fill(4)(0.toShort)
    val e = new Multimodal.WavSegmentEmbedder(4).decode(1L, wavOf(samples)).get.embedding
    assert(e.length == 4)
    assert(math.abs(e(0) - 0.5f) < 1e-6 && math.abs(e(1) - 0.5f) < 1e-6)
    assert(e(2) == 0f && e(3) == 0f)
    // malformed payloads skip, same policy as WavAudioDecoder
    assert(new Multimodal.WavSegmentEmbedder(4).decode(2L, Array[Byte](1, 2)).isEmpty)
    assert(new Multimodal.WavSegmentEmbedder(4).decode(3L, wavOf(Seq.empty)).isEmpty)
  }

  test("audioEmbeddings feed the similarity stack: nearest neighbor is the near-dup clip") {
    // same loud->quiet envelope at different lengths is the near-dup pair;
    // the quiet->loud clip is the far one
    def env(n: Int, loud: Short) =
      Seq.fill(n)(loud) ++ Seq.fill(n)(0.toShort)
    val media = Seq(
      (1L, wavOf(env(8, 16384))),
      (2L, wavOf(env(16, 14000))),                               // near-dup, longer + quieter
      (3L, wavOf(Seq.fill(8)(0.toShort) ++ Seq.fill(8)(16384.toShort))) // reversed envelope
    ).toDF("media_id", "content")
    val emb = Multimodal.audioEmbeddings(media, segments = 8)
    assert(emb.count() == 3)
    val probe = emb.filter(col("media_id") === 1L)
    val nn = graft.operators.Similarity.knnJoin(emb, "media_id", "embedding",
      probe, "media_id", "embedding", k = 1, excludeSelf = true)
      .head()
    assert(nn.getLong(1) == 2L)
  }
}
