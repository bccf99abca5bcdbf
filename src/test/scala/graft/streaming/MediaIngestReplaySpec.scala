package graft.streaming

import graft.SparkSpec
import graft.multimodal.Multimodal

/** Crash-replay property of the streaming media ingest (the media twin of
  * the price-pipeline replay pin): kill the batch step at the torn-batch
  * failpoint — AFTER the verdict append, BEFORE the index append — then
  * re-drive the same batch, exactly what a foreachBatch retry does under
  * at-least-once delivery. The replay must (a) repair the index to the
  * no-crash content, (b) keep verdicts deduplicable by (media_id, batch_id)
  * with identical reasons across attempts, and (c) leave later batches
  * deduping correctly against the repaired index. */
class MediaIngestReplaySpec extends SparkSpec {
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

  private final class Boom extends RuntimeException("injected failpoint")

  test("replay after a crash between verdict-append and index-append is idempotent") {
    val base = java.nio.file.Files.createTempDirectory("media_replay").toString
    val (indexDir, verdictsDir) = (s"$base/index", s"$base/verdicts")
    val batch1 = Seq(
      (1L, "image", gradient()),
      (2L, "image", gradient(shift = 20)), // within-batch twin of 1 -> near_dup
      (3L, "image", tent())
    ).toDF("media_id", "modality", "content")

    val cachedBefore = !spark.sharedState.cacheManager.isEmpty

    // attempt 1: dies at the failpoint — verdicts land, index rows do NOT
    intercept[Boom] {
      Multimodal.mediaIngestStep(batch1, 0L, indexDir, verdictsDir,
        failpoint = _ => throw new Boom)
    }
    assert(spark.read.parquet(verdictsDir).count() === 3)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(indexDir)),
      "torn batch: index append never ran")

    // attempt 2: the foreachBatch retry — same batch, same batchId
    Multimodal.mediaIngestStep(batch1, 0L, indexDir, verdictsDir)

    // verdicts: raw rows duplicated (at-least-once), but identical per
    // (media_id, batch_id) — the documented downstream dedup key
    val v = spark.read.parquet(verdictsDir)
    assert(v.count() === 6)
    val distinctVerdicts = v.select("media_id", "batch_id", "reason").distinct()
    assert(distinctVerdicts.count() === 3)
    val reasons = distinctVerdicts.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(reasons === Map(1L -> "ok", 2L -> "near_dup", 3L -> "ok"))

    // index: exactly the no-crash content — kept ids once each, 9 bands
    val idx = spark.read.parquet(indexDir)
    assert(idx.select("media_id").distinct().collect().map(_.getLong(0)).toSet
      === Set(1L, 3L))
    assert(idx.count() === 18)

    // a later batch dedups correctly against the repaired index
    val batch2 = Seq((21L, "image", gradient(shift = 40)),
      (23L, "image", tent())).toDF("media_id", "modality", "content")
    Multimodal.mediaIngestStep(batch2, 1L, indexDir, verdictsDir)
    val v2 = spark.read.parquet(verdictsDir).filter("batch_id = 1")
      .select("media_id", "reason").distinct().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2 === Map(21L -> "near_dup", 23L -> "near_dup"))

    // no per-batch cache leaked on either the crash or the success path
    if (!cachedBefore)
      assert(spark.sharedState.cacheManager.isEmpty,
        "mediaIngestStep leaked a pinned DataFrame")
  }
}
