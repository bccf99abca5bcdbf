package graft.streaming

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Round-5 streaming twin of the media curation pipeline: micro-batches of
  * raw bytes gate + dedup against the parquet-resident dHash index — the
  * e2e proof that ingestMediaBatch IS a valid foreachBatch body. */
class StreamingMediaIngestSpec extends SparkSpec {
  import spark.implicits._

  // same BMP builder as MediaCurationSpec (private there)
  private def pixelBmp(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val pixelOff = 54
    val buf = java.nio.ByteBuffer.allocate(pixelOff + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(pixelOff + rowBytes * h).putInt(0).putInt(pixelOff)
    buf.putInt(40).putInt(w).putInt(h)
    buf.putShort(1).putShort(24).putInt(0)
    buf.putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until h).reverse.foreach { y =>
      (0 until w).foreach { x =>
        val (r, g, b) = f(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      (w * 3 until rowBytes).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  private def gradient(shift: Int = 0): Array[Byte] =
    pixelBmp(18, 16)((x, _) => { val v = (x * 10 + shift) min 255; (v, v, v) })

  private def tent(): Array[Byte] =
    pixelBmp(18, 16)((x, _) => { val v = (if (x < 9) x * 25 else (17 - x) * 25) min 255; (v, v, v) })

  test("streamingMediaIngest: the lake index carries dedup state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("media_ingest").toString
    val (indexDir, verdictsDir, ckpt) =
      (s"$base/index", s"$base/verdicts", s"$base/ckpt")
    val input = MemoryStream[(Long, String, Array[Byte])]
    val q = Multimodal.streamingMediaIngest(
      input.toDS().toDF("media_id", "modality", "content"),
      indexDir, verdictsDir, ckpt)
    try {
      input.addData((1L, "image", gradient()), (3L, "image", tent()))
      q.processAllAvailable()
      // batch 2: a perceptual twin of batch 1's image 1 plus a fresh structure
      input.addData((21L, "image", gradient(shift = 20)), (22L, "image", gradient(shift = 40)))
      q.processAllAvailable()
      val verdicts = spark.read.parquet(verdictsDir)
        .select("media_id", "reason").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // 21 and 22 both twin the INDEXED 1 (hamming 0) -> near_dup via state;
      // nothing in batch 2 survives to extend the index
      assert(verdicts === Map(1L -> "ok", 3L -> "ok",
        21L -> "near_dup", 22L -> "near_dup"))
      val indexed = spark.read.parquet(indexDir)
        .select("media_id").distinct().collect().map(_.getLong(0)).toSet
      assert(indexed === Set(1L, 3L))
    } finally q.stop()
  }
}
